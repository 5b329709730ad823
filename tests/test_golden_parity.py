"""Engine parity vs the in-repo f64 native golden at CI scale.

The north-star bar is kernel-entry parity <= 1e-6 vs the reference
backends (BASELINE.md). The stand-in golden is the C++ LAPACK engine
(native/qk_native.cpp): f64, REFERENCE routing, ITensors cutoff semantics
(KernelPkg.jl:68). These tests pin the JAX engine against it at 16 qubits
— large enough that routing, canonical moves, staging and truncation all
engage, small enough for CI.

Measured context (scripts/parity_probe.py, 32q r2 d6): f64 engine 4e-8 at
chi=96; f32 floors at ~7e-5 from storage roundoff (TPU v5e has no f64
hardware — the f64 mode is the parity reference, f32 the production mode).
"""

import numpy as np
import pytest

from qml_cutensornet_tpu import native
from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.gram import build_kernel_matrix


@pytest.fixture(scope="module")
def golden_16q():
    nq, reps, d, gamma = 16, 2, 4, 1.0
    rng = np.random.default_rng(42)
    X = rng.uniform(0.0, 2.0, size=(5, nq))
    emap = entanglement_graph(nq, d)
    ansatz_ref = KernelStateAnsatz(nq, reps, gamma, emap, routing="reference")
    circuits = [ansatz_ref.circuit_for_data(x) for x in X]
    k_gold, chi_x, _, fid, _, _ = native.compute_tile(
        nq, circuits, cutoff=1e-16, chi_cap=256
    )
    assert min(fid) > 1 - 1e-12  # the golden itself is untruncated
    return nq, reps, gamma, emap, X, np.asarray(k_gold)


@pytest.mark.parametrize("routing", ["reference", "tracked"])
def test_f64_engine_matches_native_golden(golden_16q, routing):
    """f64 + subspace split + staged chi + fused routing: <= 1e-8 parity
    (well under the 1e-6 bar) against the independently-implemented native
    engine."""
    nq, reps, gamma, emap, X, k_gold = golden_16q
    ansatz = KernelStateAnsatz(nq, reps, gamma, emap, routing=routing)
    cfg = SimConfig(chi=128, precision="f64", svd_method="subspace",
                    subspace_iters=1)
    k = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=5, tile=5)
    assert np.abs(k - k_gold).max() < 1e-8


def test_f32_engine_error_budget(golden_16q):
    """f32 production mode WITH kernel normalization: first-order (norm)
    errors cancel in K/(<y|y><x|x>), leaving only second-order subspace
    errors — measured 1.4e-8 at 32q chi=64 on CPU (docs/PARITY.md). Pin
    the <=1e-6 parity bar at 16q."""
    nq, reps, gamma, emap, X, k_gold = golden_16q
    ansatz = KernelStateAnsatz(nq, reps, gamma, emap)
    cfg = SimConfig(chi=128, precision="f32", svd_method="subspace",
                    subspace_iters=1)
    k = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=5, tile=5)
    assert np.abs(k - k_gold).max() < 1e-6


@pytest.mark.parametrize("chi", [48, 96])
def test_f32_parity_holds_off_power_of_two_caps(golden_16q, chi):
    """Regression for the round-2 "chi flicker": non-power-of-two caps must
    meet the 1e-6 bar too. The former ~3e-6 deviation was the
    normalization-path diagonal artifact (state norms vs tile scan rounding
    differently); diag-based normalization makes the cap irrelevant and the
    diagonal exactly 1 (docs/PARITY.md round-3 section)."""
    nq, reps, gamma, emap, X, k_gold = golden_16q
    ansatz = KernelStateAnsatz(nq, reps, gamma, emap)
    cfg = SimConfig(chi=chi, precision="f32", svd_method="subspace",
                    subspace_iters=1)
    k = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=5, tile=5)
    assert np.abs(np.diag(k) - 1.0).max() < 1e-6
    assert np.abs(k - k_gold).max() < 1e-6
