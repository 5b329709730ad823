"""North-star benchmark: N x N train-Gram build wall-clock at 32 qubits.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "seconds", "vs_baseline": ...}

Config mirrors the reference's qubit_scaling family (runs/qubit_scaling:
r=2, d=6, 10 points per run on one A100) at nq=32 with N=100 datapoints.

Baseline (1x A100, from /root/repo/BASELINE.md):
  - avg MPS simulation time per circuit at nq=30, gamma=1.0, r2 d6:
    7.19 s (runs/qubit_scaling/results.csv); time scales ~linearly in nq
    => ~7.67 s at nq=32.
  - median vdot at 100q d6: 0.0138 s (runs/crossover/gpu_results.csv);
    the symmetric Gram needs N(N+1)/2 vdots.
  baseline_seconds = N * 7.67 + N*(N+1)/2 * 0.0138

``vs_baseline`` is the speedup factor (baseline_seconds / our_seconds) for
the same work on ONE TPU chip. Knobs: BENCH_NQ, BENCH_N, BENCH_D, BENCH_REPS,
BENCH_GAMMA, BENCH_CHI, QMLTPU_* (see cli/_pipeline.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr)
    sys.stderr.flush()


def main() -> None:
    nq = int(os.environ.get("BENCH_NQ", 32))
    n_points = int(os.environ.get("BENCH_N", 100))
    d = int(os.environ.get("BENCH_D", 6))
    reps = int(os.environ.get("BENCH_REPS", 2))
    gamma = float(os.environ.get("BENCH_GAMMA", 1.0))
    chi = int(os.environ.get("BENCH_CHI", 64))
    # Whole-batch execution measured fastest with the Pallas orthonormalizer
    # (batch blocks are sized internally to VMEM): 3.16 s vs 3.40 s at 50.
    sim_batch = int(os.environ.get("QMLTPU_SIM_BATCH", 100))
    # Tile auto-size: the tile scan's live peak is dominated by the step
    # temps t1/t2 [tile, tile*chi, 2^k*chi] (re,im f32 pairs) — which scale
    # with BOTH chi^2 and the site-block factor 2^k — plus the pre-combined
    # site blocks (~= a second copy of each tile input batch when k > 1,
    # since the originals stay live in the jit). Budget the temps at
    # <= ~2.75 GB (the measured-good chi128/k=1 and chi64/k=2 points both
    # sit just under; tile=100 at chi=256/k=1 was a measured OOM).
    # Site-block default policy (MEASURED, runs/perf_ab): k=2 wins only
    # while its (smaller) safe tile still covers the batch in ONE dispatch
    # — at chi=128, k=2/tile=72 took tiles 2.05 -> 3.05 s vs k=1/tile=100
    # because ceil(100/72)=2 splits the batch into 4 padded tile dispatches
    # (2.07x the pair work). So: k=2 iff tile_for(k=2) >= n_points.
    def _tile_for(k: int) -> int:
        return min(100, int((2.75e9 / (chi * chi * 2 ** k * 8)) ** 0.5))

    tb_env = os.environ.get("QMLTPU_TILE_BLOCK")
    if tb_env is not None:
        tb = int(tb_env)
    else:
        tb = 2 if _tile_for(2) >= n_points else 1
    tile = int(os.environ.get("QMLTPU_TILE", _tile_for(tb)))

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.utils.data import (
        load_and_prepare,
        make_synthetic_elliptic,
        preprocess_elliptic,
    )
    from qml_cutensornet_tpu.cli._pipeline import init_platform
    from qml_cutensornet_tpu.utils.jaxenv import setup_compilation_cache

    init_platform()  # honor QMLTPU_PLATFORM (e.g. "cpu") like the CLI
    setup_compilation_cache()
    import jax

    # Bounded backend probe: a wedged TPU tunnel hangs jax.devices()
    # indefinitely (observed: hours). Healthy init is seconds (compiles are
    # slow, init is not), so a generous timeout only ever fires on a dead
    # backend — emit a legible JSON error line instead of hanging forever.
    import threading

    probe: dict = {}

    def _probe():
        try:
            probe["devs"] = jax.devices()
        except Exception as e:  # pragma: no cover - backend init failure
            probe["err"] = repr(e)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(float(os.environ.get("BENCH_INIT_TIMEOUT_S", "300")))
    if "devs" not in probe:
        print(json.dumps({
            "metric": "train-Gram wall-clock (backend unavailable)",
            "value": None,
            "unit": "seconds",
            "vs_baseline": None,
            "error": probe.get("err", "jax backend init timed out"),
        }))
        sys.exit(1)

    log(f"bench devices: {probe['devs']}")

    # Smoke-gate advisory (never fatal — the driver's bench must not depend
    # on host-local state): warn loudly when the Pallas kernel sources have
    # no on-chip smoke PASS stamp, so A/B automation can't silently bank
    # numbers on kernels that were never run under real Mosaic lowering
    # (interpret mode and lowering-only CI both miss the [B,1,1] abort
    # class — scripts/tpu_smoke.py, CLAUDE.md).
    try:
        if probe["devs"][0].platform == "tpu":
            import importlib.util as _ilu
            import pathlib

            _spec = _ilu.spec_from_file_location(
                "tpu_smoke",
                pathlib.Path(__file__).resolve().parent / "scripts/tpu_smoke.py",
            )
            _sm = _ilu.module_from_spec(_spec)
            _spec.loader.exec_module(_sm)
            if not _sm.check_stamp():
                log("WARNING: no fresh on-chip smoke stamp for the Pallas "
                    "kernel sources — run scripts/tpu_smoke.py --ensure "
                    "before trusting kernel-path timings")
    except Exception:
        pass

    # Feature data through the REAL pipeline (sampler + scaler chain): the
    # reference's chi statistics depend on the post-scaler feature
    # distribution, so uniform angles would misrepresent the workload.
    # The bench is PINNED to the v1 (dense-Gaussian) dataset: the round-5
    # generator v2 (cluster prototypes, for model-quality suites) collapses
    # the bench ensemble's avg chi 53.7 -> 11.7, which would silently make
    # the perf workload easier and break cross-round comparability; the
    # committed f64 golden is computed on these features. BENCH_DATASET
    # overrides.
    import pathlib

    bench_csv = os.environ.get(
        "BENCH_DATASET", "datasets/elliptic_preproc_bench.csv"
    )
    if not pathlib.Path(bench_csv).is_file():
        if pathlib.Path("datasets/elliptic_bitcoin_dataset_v1").is_dir():
            preprocess_elliptic(
                dataset_dir="datasets/elliptic_bitcoin_dataset_v1",
                out_csv=bench_csv,
            )
        else:  # fresh checkout without the archive: fall back to canonical
            if not pathlib.Path("datasets/elliptic_preproc.csv").is_file():
                make_synthetic_elliptic()
                preprocess_elliptic()
            bench_csv = "datasets/elliptic_preproc.csv"
    half = -(-5 * n_points // 8) + 1  # train split is ~80% of 2*half
    X, _, _, _ = load_and_prepare(bench_csv, nq, half, half, 5)
    X = X[:n_points]
    assert len(X) == n_points, f"got {len(X)} points"

    ansatz = KernelStateAnsatz(
        nq, reps, gamma, entanglement_graph(nq, d),
        routing=os.environ.get("QMLTPU_ROUTING", "tracked"),
    )
    cfg = SimConfig(
        chi=chi,
        precision=os.environ.get("QMLTPU_PRECISION", "f32"),
        # The matmul-only factorization is the TPU production path (~26x
        # faster than the QDWH-based reference path at this size).
        svd_method=os.environ.get("QMLTPU_SVD", "subspace"),
        # One power iteration is exact under exact rank and loses <1e-5
        # fidelity under the bench's mild truncation; ~25% faster.
        subspace_iters=int(os.environ.get("QMLTPU_SUBSPACE_ITERS", 1)),
        # Default p=16 at chi >= 128: measured FREE there (bench_over16_chi128
        # vs bench_chi128: same wall, parity 5.8e-8 -> 1.1e-8); costs ~14%
        # at chi 64 so it stays off below 128.
        oversample=int(
            os.environ.get("QMLTPU_OVERSAMPLE", 16 if chi >= 128 else 0)
        ),
        power_precision=os.environ.get("QMLTPU_POWER_PRECISION", "inherit"),
        tile_precision=os.environ.get("QMLTPU_TILE_PRECISION", "inherit"),
        # Default ON since the on-chip A/B (runs/perf_ab): chi64 2.64 s vs
        # 2.85 s unfused at parity 5.9e-8 / fidelity 0.99996, and 5.2x on
        # sim at chi256; auto-falls back off the eligible range.
        fused_split=os.environ.get("QMLTPU_FUSED_SPLIT", "1") != "0",
        # Phase 2 (theta build + gate application in-kernel): off pending
        # the on-chip A/B (runs/perf_ab).
        fused_gate=os.environ.get("QMLTPU_FUSED_GATE", "0") != "0",
        mgs_pair=os.environ.get("QMLTPU_MGS_PAIR", "0") != "0",
        brick_struct_caps=os.environ.get("QMLTPU_BRICK_CAPS", "0") != "0",
        # k=2 A/B win at the headline shape (runs/perf_ab/bench_tileblk2 vs
        # bench_ctrl_r3end): 2.470 s vs 2.565 s, tiles 0.64 -> 0.54 s, at
        # parity 5.8e-8 / fidelity 0.99996; auto-falls back to 1 when the
        # k=2-safe tile cannot cover the batch in one dispatch (see above).
        tile_block=tb,
    )
    sched = ansatz.schedule
    if hasattr(sched, "bricks"):
        n_layers = sum(len(r.parities) for r in sched.bricks)
        log(f"schedule: brick, {n_layers} layers x {sched.pairs_per_layer} "
            f"pairs, chi={chi}")
    else:
        log(f"schedule: {sched.num_two_site_ops} two-site ops "
            f"({sched.num_gate_ops} gates), chi={chi}")

    kwargs = dict(truncation_error=1e-16, cfg=cfg, sim_batch=sim_batch, tile=tile)
    mesh_env = os.environ.get("QMLTPU_MESH")
    if mesh_env and int(mesh_env) > 1:
        from qml_cutensornet_tpu.parallel.mesh import make_mesh

        kwargs["mesh"] = make_mesh(int(mesh_env))

    # Warm-up pass compiles every shape in the pipeline (cached persistently).
    t0 = time.perf_counter()
    k1 = build_kernel_matrix(ansatz, X, info_file=None, **kwargs)
    t_cold = time.perf_counter() - t0
    log(f"cold run (incl. compile): {t_cold:.2f}s")

    t0 = time.perf_counter()
    k2 = build_kernel_matrix(ansatz, X, info_file="/tmp/bench_profile", **kwargs)
    t_warm = time.perf_counter() - t0
    log(f"warm run: {t_warm:.2f}s; K sane: "
        f"sym={np.allclose(k2, k2.T, atol=1e-4)}, "
        f"diag_err={np.abs(np.diag(k2) - 1).max():.2e}")

    # Parity column: compare the leading block against the committed f64
    # golden (in-repo C++ LAPACK engine, reference routing, cutoff 1e-16,
    # chi cap 192 — scripts/make_golden.py). Only valid when the bench
    # config and dataset match the golden's.
    max_abs_err = None
    gold_path = pathlib.Path(
        f"runs/golden/bench_nq{nq}_r{reps}_d{d}_g{gamma}_N8.npz"
    )
    if gold_path.is_file():
        gold = np.load(gold_path)
        if gold["x"].shape[1] == nq and np.allclose(gold["x"], X[: len(gold["x"])]):
            g = len(gold["x"])
            max_abs_err = float(np.abs(k2[:g, :g] - gold["k"]).max())
            log(f"max_abs_err vs f64 golden ({g}x{g} block): {max_abs_err:.3e}")
        else:
            log("golden present but config/dataset mismatch; skipping parity column")
    avg_fidelity = sim_s = dot_s = None
    try:
        import json as _json

        prof = _json.load(open("/tmp/bench_profile.json"))
        avg_fidelity = round(float(prof["avg_fidelity"][0]), 8)
        sim_s = round(float(prof["r0_circ_sim"][0]), 3)
        dot_s = round(float(prof["r0_product"][0]), 3)
        log(f"avg_fidelity={avg_fidelity:.8f} "
            f"avg_max_chi={prof['ave max chi x'][0]:.1f} "
            f"sim={sim_s:.2f}s tiles={dot_s:.2f}s")
    except Exception:
        pass

    # A100 baseline model (see module docstring).
    per_circ_a100 = 7.19 * (nq / 30.0)
    per_vdot_a100 = 0.0138
    baseline = n_points * per_circ_a100 + n_points * (n_points + 1) / 2 * per_vdot_a100

    # Roofline columns: analytic FLOPs of the dispatched shapes
    # (utils/flops.py shares the engine's own stage/chunk plans) over the
    # measured phase times. Covers tracked AND brick routing.
    sim_roof = tile_roof = None
    if os.environ.get("QMLTPU_ROUTING", "tracked") in ("tracked", "brick"):
        try:
            from qml_cutensornet_tpu.utils import flops as flops_mod

            staged = os.environ.get("QMLTPU_STAGED", "1") != "0"
            fl = flops_mod.gram_flops(
                ansatz.schedule, cfg, n_points, staged=staged
            )
            if sim_s:
                sim_roof = flops_mod.roofline(fl["sim_flops"], sim_s)
            if dot_s:
                tile_roof = flops_mod.roofline(fl["tile_flops"], dot_s)
            log(f"model: sim {fl['sim_flops']:.3e} FLOP, "
                f"tiles {fl['tile_flops']:.3e} FLOP at chi={fl['final_chi']}; "
                f"roofline sim={sim_roof} tiles={tile_roof} "
                f"(peak = v5e f32-HIGHEST, 32.8 TFLOP/s)")
        except Exception as e:  # model must never break the bench line
            log(f"flops model skipped: {e!r}")

    prec = os.environ.get("QMLTPU_PRECISION", "f32")
    print(json.dumps({
        "metric": f"{n_points}x{n_points} train-Gram wall-clock, {nq} qubits (r{reps} d{d} g{gamma} chi{chi}, {prec}, 1 chip)",
        "value": round(t_warm, 3),
        "unit": "seconds",
        "vs_baseline": round(baseline / t_warm, 2),
        "max_abs_err_vs_f64_golden": max_abs_err,
        "avg_fidelity": avg_fidelity,
        "sim_seconds": sim_s,
        "tile_seconds": dot_s,
        "sim_tflops": sim_roof["tflops"] if sim_roof else None,
        "sim_peak_fraction": sim_roof["peak_fraction"] if sim_roof else None,
        "tile_tflops": tile_roof["tflops"] if tile_roof else None,
        "tile_peak_fraction": tile_roof["peak_fraction"] if tile_roof else None,
    }))


if __name__ == "__main__":
    main()
