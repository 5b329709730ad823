"""Generate a synthetic dataset with the Kaggle Elliptic schema and run the
preprocessor on it. Not part of the reference (which assumes the Kaggle
download, README.md:65); needed here because the environment has no network
access.

    python -m qml_cutensornet_tpu.cli.make_synthetic [n_labeled] [seed]
"""

from __future__ import annotations

import sys

from qml_cutensornet_tpu.utils.data import make_synthetic_elliptic, preprocess_elliptic


def main(argv=None) -> None:
    argv = sys.argv if argv is None else argv
    n_labeled = int(argv[1]) if len(argv) > 1 else 2000
    seed = int(argv[2]) if len(argv) > 2 else 0
    force = "--force" in argv
    make_synthetic_elliptic(n_labeled=n_labeled, seed=seed, force=force)
    df = preprocess_elliptic()
    n0 = int((df["Class"] == 0).sum())
    n1 = int((df["Class"] == 1).sum())
    print(f"Wrote datasets/elliptic_preproc.csv: {len(df)} rows "
          f"({n0} illicit / {n1} licit), {df.shape[1] - 1} feature columns.")


if __name__ == "__main__":
    main()
