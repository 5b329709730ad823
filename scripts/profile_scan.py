"""In-scan per-op budget decomposition at the bench shape.

`scripts/profile_op.py` times ISOLATED ops (one dispatch each), which
includes per-dispatch overhead the real scanned stream amortizes — its
numbers (e.g. 5.5 ms/op at chi64) cannot explain the measured in-scan
1.7 ms/op. This script times the REAL chunked simulator (the bench's sim
phase) with components selectively replaced by shape-preserving fakes,
so the deltas attribute the in-scan budget:

    ctrl            full sim phase (should reproduce bench sim_seconds)
    nomove          center moves -> identity (no slice/QR/scatter)
    nosplit         truncated_svd -> column-slice fake (theta build, gate
                    einsums, writeback kept; subspace chain + mask gone)
    nosplit_nomove  both
    glue            apply_2site AND move_center -> identity (scan/cond/
                    angle math only)

Numerics are WRONG for every variant except ctrl — timing only.
Each variant runs in its own process (the simulator closure cache is
keyed on cfg and would not see the monkeypatch).

Usage:  python scripts/profile_scan.py            # run all variants
        python scripts/profile_scan.py ctrl       # one variant (internal)
Results append to runs/perf_ab/profile_scan.jsonl.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
VARIANTS = ("ctrl", "nomove", "nosplit", "nosplit_nomove", "glue")


def patch(variant: str) -> None:
    from qml_cutensornet_tpu.ops import cpx, mps as mps_ops, svd
    from qml_cutensornet_tpu.models import simulate

    def fake_truncated_svd(m, cfg, keep):
        # Shape-true fake: left [m, keep] / right [keep, k] slices of the
        # input (keeps the theta einsums and writeback live against DCE),
        # kept_fraction/rank constants.
        import jax.numpy as jnp

        left = cpx.Cpx(m.re[:, :keep], m.im[:, :keep])
        right = cpx.Cpx(m.re[:keep, :], m.im[:keep, :])
        one = jnp.asarray(1.0, m.re.dtype)
        return left, right, one, jnp.asarray(keep, jnp.int32)

    def fake_move(mps, site, direction, cfg):
        return mps

    if variant in ("nosplit", "nosplit_nomove"):
        svd.truncated_svd = fake_truncated_svd
        mps_ops.truncated_svd = fake_truncated_svd
    if variant in ("nomove", "nosplit_nomove"):
        mps_ops.move_center = fake_move
    if variant == "glue":
        mps_ops.move_center = fake_move
        mps_ops.apply_2site = (
            lambda mps, site, u4, cfg, direction=None: mps
        )


def run_variant(variant: str) -> dict:
    patch(variant)

    from qml_cutensornet_tpu.cli._pipeline import init_platform
    from qml_cutensornet_tpu.utils.jaxenv import setup_compilation_cache

    init_platform()
    setup_compilation_cache()
    import jax

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.simulate import make_chunked_simulator
    from qml_cutensornet_tpu.utils.data import load_and_prepare

    nq = int(os.environ.get("BENCH_NQ", 32))
    n_points = int(os.environ.get("BENCH_N", 100))
    d = int(os.environ.get("BENCH_D", 6))
    chi = int(os.environ.get("BENCH_CHI", 64))
    gamma = float(os.environ.get("BENCH_GAMMA", 1.0))

    # Same v1-pinned bench dataset as bench.py (perf workload comparability).
    bench_csv = os.environ.get(
        "BENCH_DATASET", "datasets/elliptic_preproc_bench.csv"
    )
    if not os.path.isfile(bench_csv):
        bench_csv = "datasets/elliptic_preproc.csv"
    half = -(-5 * n_points // 8) + 1
    X, _, _, _ = load_and_prepare(bench_csv, nq, half, half, 5)
    X = X[:n_points]
    ansatz = KernelStateAnsatz(nq, 2, gamma, entanglement_graph(nq, d))
    cfg = SimConfig(
        chi=chi,
        precision="f32",
        svd_method="subspace",
        subspace_iters=1,
        oversample=16 if chi >= 128 else 0,
        fused_split=os.environ.get("QMLTPU_FUSED_SPLIT", "1") != "0",
        mgs_pair=os.environ.get("QMLTPU_MGS_PAIR", "0") != "0",
    )
    sim = make_chunked_simulator(ansatz.schedule, cfg)
    n_ops = ansatz.schedule.num_two_site_ops
    n_gates = ansatz.schedule.num_gate_ops

    t0 = time.perf_counter()
    out = sim(X)
    np.asarray(out.tensors.re[0, 0, 0, 0])  # materialize (tunnel-safe timing)
    cold = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = sim(X)
        np.asarray(out.tensors.re[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    rec = {
        "variant": variant,
        "nq": nq,
        "chi": chi,
        "batch": n_points,
        "n_ops": n_ops,
        "n_gates": n_gates,
        "n_moves": n_ops - n_gates,
        "fused_split": cfg.fused_split,
        "cold_s": round(cold, 3),
        "warm_s": round(float(np.median(times)), 4),
        "warm_each": [round(t, 4) for t in times],
        "ms_per_op": round(1e3 * float(np.median(times)) / n_ops, 4),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    out_path = REPO / "runs/perf_ab/profile_scan.jsonl"
    recs = []
    for v in VARIANTS:
        r = subprocess.run(
            [sys.executable, __file__, v],
            capture_output=True, text=True, cwd=str(REPO),
            env={**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site"},
            timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            recs.append(json.loads(line[-1]))
            with open(out_path, "a") as f:
                f.write(line[-1] + "\n")
        else:
            print(f"variant {v} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
    if len(recs) == len(VARIANTS):
        by = {r["variant"]: r["warm_s"] for r in recs}
        print(json.dumps({
            "summary": {
                "total_s": by["ctrl"],
                "move_cost_s": round(by["ctrl"] - by["nomove"], 4),
                "split_cost_s": round(by["ctrl"] - by["nosplit"], 4),
                "gate_glue_s": round(by["nosplit_nomove"] - by["glue"], 4),
                "scan_glue_s": by["glue"],
            }
        }))


if __name__ == "__main__":
    main()
