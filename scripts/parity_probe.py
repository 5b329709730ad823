"""Parity probe: decompose the TPU engine's kernel-entry error budget.

Measures, at the bench config (nq=32, r2, d6, gamma 1.0 by default), against
an f64 golden from the in-repo C++ LAPACK engine (reference-routed, ITensors
cutoff semantics — the stand-in for gpu:380 / KernelPkg.jl:106):

  1. chi*: the cap at which truncation becomes negligible (native fidelity
     sweep over chi caps).
  2. The JAX engine's error vs the golden across (precision, svd_method,
     subspace_iters, chi, routing) — separating truncation error (chi too
     small) from arithmetic error (f32 roundoff, factorization quality).

Run on CPU (tests-like env):
    JAX_PLATFORMS=cpu python scripts/parity_probe.py
Knobs: PROBE_NQ, PROBE_N, PROBE_D, PROBE_REPS, PROBE_GAMMA, PROBE_CHIS,
PROBE_GOLD_CHI, PROBE_CASES.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(*a):
    print(*a, file=sys.stderr)
    sys.stderr.flush()


def main():
    # Force CPU x64 before any backend init unless the caller overrides.
    import jax

    if os.environ.get("PROBE_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    nq = int(os.environ.get("PROBE_NQ", 32))
    n_points = int(os.environ.get("PROBE_N", 8))
    d = int(os.environ.get("PROBE_D", 6))
    reps = int(os.environ.get("PROBE_REPS", 2))
    gamma = float(os.environ.get("PROBE_GAMMA", 1.0))
    gold_chi = int(os.environ.get("PROBE_GOLD_CHI", 384))
    chis = [int(c) for c in os.environ.get("PROBE_CHIS", "64,96,128,192").split(",")]

    from qml_cutensornet_tpu import native
    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.utils.data import (
        load_and_prepare,
        make_synthetic_elliptic,
        preprocess_elliptic,
    )

    if not pathlib.Path("datasets/elliptic_preproc.csv").is_file():
        make_synthetic_elliptic(n_labeled=4 * max(n_points, 100), seed=11)
        preprocess_elliptic()
    half = -(-5 * max(n_points, 100) // 8) + 1
    X, _, _, _ = load_and_prepare("datasets/elliptic_preproc.csv", nq, half, half, 5)
    X = X[:n_points]

    emap = entanglement_graph(nq, d)
    ansatz_ref = KernelStateAnsatz(nq, reps, gamma, emap, routing="reference")

    # --- Golden kernel: reuse the committed artifact when it matches. ---
    gold_file = pathlib.Path(f"runs/golden/bench_nq{nq}_r{reps}_d{d}_g{gamma}_N{n_points}.npz")
    k_gold = None
    if os.environ.get("PROBE_SWEEP", "0") != "1" and gold_file.is_file():
        gold = np.load(gold_file)
        if np.allclose(gold["x"], X):
            k_gold = gold["k"]
            log(f"golden: reusing {gold_file} (cap={int(gold['chi_cap'])}, "
                f"min_fid={float(gold['min_fid']):.12f})")

    if k_gold is None:
        circuits = [ansatz_ref.circuit_for_data(x) for x in X]
        # --- 1. chi* sweep on the native engine (fidelity vs cap). ---
        log(f"== native chi sweep (nq={nq} r{reps} d{d} g{gamma}, {n_points} circuits) ==")
        for cap in sorted(set(chis + [gold_chi])):
            t0 = time.perf_counter()
            tile, chi_x, _, fid, _, _ = native.compute_tile(
                nq, circuits[: min(4, n_points)], cutoff=1e-16, chi_cap=cap,
            )
            dt = time.perf_counter() - t0
            log(f"native cap={cap:4d}: max_chi={max(chi_x)} "
                f"min_fid={min(fid):.12f} ({dt:.1f}s)")

        # --- 2. golden kernel at gold_chi (≈ exact). ---
        log(f"== golden tile at cap={gold_chi} ==")
        t0 = time.perf_counter()
        k_gold, chi_x, _, fid, _, _ = native.compute_tile(
            nq, circuits, cutoff=1e-16, chi_cap=gold_chi
        )
        log(f"golden: {time.perf_counter() - t0:.1f}s, max_chi={max(chi_x)}, "
            f"min_fid={min(fid):.12f}")

    # --- 3. engine cases. ---
    cases = os.environ.get(
        "PROBE_CASES",
        # precision:svd:iters:chi:routing
        "f64:svd:2:128:reference,f64:subspace:2:128:reference,"
        "f64:subspace:2:128:tracked,f64:subspace:1:128:tracked,"
        "f32:subspace:2:128:tracked,f32:subspace:1:64:tracked,"
        "f64:subspace:2:64:tracked,f64:subspace:2:192:tracked",
    ).split(",")
    print(f"{'case':>38s}  {'max_abs_err':>12s}  {'rms_err':>10s}  {'secs':>7s}")
    for case in cases:
        parts = case.strip().split(":")
        prec, svd, iters, chi, routing = parts[:5]
        # Optional trailing fields: "fused" (fused Pallas kernels; add
        # "interp" to force interpret mode off-TPU), "pp=high" /
        # "tp=high" (power/tile precision) — the round-3 knobs.
        extra = {}
        for flag in parts[5:]:
            if flag == "fused":
                extra["fused_split"] = True
            elif flag == "interp":
                extra["fused_interpret"] = True
            elif flag.startswith("pp="):
                extra["power_precision"] = flag[3:]
            elif flag.startswith("tp="):
                extra["tile_precision"] = flag[3:]
            else:
                raise ValueError(f"unknown probe flag {flag!r} in {case!r}")
        ansatz = (
            ansatz_ref
            if routing == "reference"
            else KernelStateAnsatz(nq, reps, gamma, emap, routing="tracked")
        )
        cfg = SimConfig(
            chi=int(chi),
            truncation_error=1e-16,
            precision=prec,
            svd_method=svd,
            subspace_iters=int(iters),
            **extra,
        )
        t0 = time.perf_counter()
        k = build_kernel_matrix(
            ansatz, X, truncation_error=1e-16, cfg=cfg, sim_batch=n_points,
            tile=n_points,
        )
        dt = time.perf_counter() - t0
        err = np.abs(k - k_gold)
        print(f"{case:>38s}  {err.max():12.3e}  "
              f"{np.sqrt((err ** 2).mean()):10.3e}  {dt:7.1f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
