"""Real-quantum-kernel probe of a candidate dataset at table2/table3
configs, plus kernel-concentration diagnostics.

For each (reps, gamma, nn, chi) config: run the REAL pipeline slice
(load_and_prepare at nf=50, 200+200 points, seed 5 -> ansatz -> train/test
Gram on the current backend -> svc_sweep) and report best-AUC plus
off-diagonal kernel statistics. The concentration stats are the table3
diagnosis the round-4 verdict asked for: a collapsed deep row with
offdiag_mean ~ 0 and tiny offdiag_std means the kernel has concentrated
(every state pair near-orthogonal) and NO classifier can use it — a data
property, not an engine bug; r=8 at chi=256 on a 50-qubit nn=1 chain is
structurally EXACT (bond bound 2^8), so comparing chi=64 vs chi=256 at r=8
separates truncation artifacts from data properties.

Usage:
    python scripts/probe_dataset.py <preproc_csv> [tag] [--full]
Default configs: (2,1.0,1,64) (8,1.0,1,64) (2,0.1,1,64); --full adds
(8,1.0,1,256) (20,1.0,1,64) (2,1.0,6,64).
Appends JSON lines to runs/table3/probe_<tag>.jsonl.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def probe(csv: str, tag: str, full: bool = False) -> None:
    from qml_cutensornet_tpu.cli._pipeline import init_platform
    from qml_cutensornet_tpu.utils.jaxenv import setup_compilation_cache

    init_platform()
    setup_compilation_cache()

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.models.svm import svc_sweep
    from qml_cutensornet_tpu.utils.data import load_and_prepare

    nf = int(os.environ.get("PROBE_NF", 50))
    ntr = int(os.environ.get("PROBE_NTR", 200))
    seed = int(os.environ.get("PROBE_SEED", 5))
    xtr, ytr, xte, yte = load_and_prepare(csv, nf, ntr, ntr, seed)

    configs = [(2, 1.0, 1, 64), (8, 1.0, 1, 64), (2, 0.1, 1, 64)]
    if full:
        configs += [(8, 1.0, 1, 256), (20, 1.0, 1, 64), (2, 1.0, 6, 64)]
    if os.environ.get("PROBE_CONFIGS"):  # "r,g,nn,chi;r,g,nn,chi" override
        configs = [
            tuple(float(x) if i == 1 else int(float(x)) for i, x in enumerate(c.split(",")))
            for c in os.environ["PROBE_CONFIGS"].split(";")
        ]

    out_path = REPO / f"runs/table3/probe_{tag}.jsonl"
    for reps, gamma, nn, chi in configs:
        ansatz = KernelStateAnsatz(nf, reps, gamma, entanglement_graph(nf, nn))
        cfg = SimConfig(chi=chi, precision="f32")
        sim_batch = int(os.environ.get("QMLTPU_SIM_BATCH", 64 if chi <= 64 else 8))
        tile = int(os.environ.get("QMLTPU_TILE", 64 if chi <= 64 else 16))
        t0 = time.perf_counter()
        ktr = build_kernel_matrix(
            ansatz, xtr, cfg=cfg, sim_batch=sim_batch, tile=tile
        )
        # K[i,j] = |<psi(Y_i)|psi(X_j)>|^2 -> [n_test, n_train] like main.py:38.
        kte = build_kernel_matrix(
            ansatz, xtr, Y=xte, cfg=cfg, sim_batch=sim_batch, tile=tile
        )
        wall = time.perf_counter() - t0
        res, _ = svc_sweep(ktr, ytr, kte, yte, verbose=False)
        best = max(res, key=lambda r: r[4])
        off = ktr[~np.eye(len(ktr), dtype=bool)]
        same = ktr[(ytr[:, None] == ytr[None, :]) & ~np.eye(len(ktr), dtype=bool)]
        diff = ktr[ytr[:, None] != ytr[None, :]]
        rec = {
            "tag": tag, "reps": reps, "gamma": gamma, "nn": nn, "chi": chi,
            "auc": round(best[4], 4), "acc": round(best[1], 4),
            "C": best[0], "wall_s": round(wall, 1),
            "offdiag_mean": float(off.mean()), "offdiag_std": float(off.std()),
            "same_minus_diff": float(same.mean() - diff.mean()),
            "seed": seed,
        }
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    csv = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "probe"
    probe(csv, tag, full="--full" in sys.argv)
