"""Classical Gaussian-kernel baseline (reference ``runs/table2/classical_main.py``):
same data pipeline, ``SVC(kernel="rbf", gamma="scale")`` over the same C
sweep, saved as ``raw/gaussian/seed_{s}.npy``-style rows.

    python -m qml_cutensornet_tpu.cli.classical_main <num_features>
        <n_illicit> <n_licit> <data_seed> <data_file> [out.npy]
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

from qml_cutensornet_tpu.models.svm import classical_rbf_sweep
from qml_cutensornet_tpu.utils.data import load_and_prepare


def main(argv=None) -> None:
    argv = sys.argv if argv is None else argv
    if len(argv) <= 5:
        raise ValueError(
            "Call as 'python classical_main.py <num_features> <n_illicit> "
            "<n_licit> <data_seed> <data_file> [out.npy]'."
        )
    num_features = int(argv[1])
    n_illicit = int(argv[2])
    n_licit = int(argv[3])
    data_seed = int(argv[4])
    data_file = str(argv[5])
    out = argv[6] if len(argv) > 6 else f"raw/gaussian/seed_{data_seed}.npy"

    x_train, y_train, x_test, y_test = load_and_prepare(
        "datasets/" + data_file, num_features, n_illicit, n_licit, data_seed
    )
    test_results, _ = classical_rbf_sweep(x_train, y_train, x_test, y_test)
    pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
    np.save(out, test_results)


if __name__ == "__main__":
    main()
