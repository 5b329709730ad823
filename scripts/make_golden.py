"""Generate the committed f64 golden kernel for bench.py's parity column.

Computes, with the in-repo C++ LAPACK engine (f64, REFERENCE routing,
ITensors cutoff semantics — the stand-in for the reference backends,
gpu_backend/kernel_state_ansatz.py:380 / KernelPkg.jl:106), the exact
kernel block K[:G, :G] for the first G points of the bench dataset, and
stores it with the feature block so bench.py can verify it is comparing
the same inputs.

Run:  python scripts/make_golden.py          (~15 min CPU at cap 192)
Knobs: GOLD_N (block size, default 8), GOLD_CHI (cap, default 192), and
the BENCH_* config knobs bench.py uses.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    nq = int(os.environ.get("BENCH_NQ", 32))
    n_points = int(os.environ.get("BENCH_N", 100))
    d = int(os.environ.get("BENCH_D", 6))
    reps = int(os.environ.get("BENCH_REPS", 2))
    gamma = float(os.environ.get("BENCH_GAMMA", 1.0))
    g = int(os.environ.get("GOLD_N", 8))
    cap = int(os.environ.get("GOLD_CHI", 192))

    from qml_cutensornet_tpu import native
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.utils.data import (
        load_and_prepare,
        make_synthetic_elliptic,
        preprocess_elliptic,
    )

    # Identical dataset construction to bench.py (PINNED to the v1 bench
    # dataset — see bench.py's rationale; BENCH_DATASET overrides).
    bench_csv = os.environ.get(
        "BENCH_DATASET", "datasets/elliptic_preproc_bench.csv"
    )
    if not pathlib.Path(bench_csv).is_file():
        if pathlib.Path("datasets/elliptic_bitcoin_dataset_v1").is_dir():
            preprocess_elliptic(
                dataset_dir="datasets/elliptic_bitcoin_dataset_v1",
                out_csv=bench_csv,
            )
        else:
            if not pathlib.Path("datasets/elliptic_preproc.csv").is_file():
                make_synthetic_elliptic()
                preprocess_elliptic()
            bench_csv = "datasets/elliptic_preproc.csv"
    half = -(-5 * n_points // 8) + 1
    X, _, _, _ = load_and_prepare(bench_csv, nq, half, half, 5)
    X = X[:n_points]

    ansatz = KernelStateAnsatz(nq, reps, gamma, entanglement_graph(nq, d),
                               routing="reference")
    circuits = [ansatz.circuit_for_data(x) for x in X[:g]]
    t0 = time.perf_counter()
    k_gold, chi_x, _, fid, _, _ = native.compute_tile(
        nq, circuits, cutoff=1e-16, chi_cap=cap
    )
    print(f"native golden: {time.perf_counter() - t0:.1f}s, "
          f"max_chi={max(chi_x)}, min_fid={min(fid):.12f}", file=sys.stderr)

    out = pathlib.Path("runs/golden")
    out.mkdir(parents=True, exist_ok=True)
    name = f"bench_nq{nq}_r{reps}_d{d}_g{gamma}_N{g}.npz"
    np.savez(out / name, k=np.asarray(k_gold), x=np.asarray(X[:g]),
             chi_cap=cap, min_fid=min(fid))
    print(f"wrote runs/golden/{name}")


if __name__ == "__main__":
    main()
