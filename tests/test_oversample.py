"""Subspace oversampling (SimConfig.oversample / QMLTPU_OVERSAMPLE).

Randomized-SVD style: the subspace iteration runs with ``keep + p`` basis
columns and the top-``keep`` directions by captured weight are gathered out
(ops/svd._split_subspace). Invariants pinned here:

- exact-rank regime: oversampled factorization is still EXACT (the wider
  iterate spans a superset of the plain one);
- truncating regime: the oversampled subspace captures AT LEAST as much
  squared weight as the plain one (that is its whole point — near the cut
  a keep-width iterate can rotate weak directions out of its span);
- structural invariants survive the gather: masked columns exactly zero,
  kept columns orthonormal, right = left^H theta;
- engine-level: a full circuit + kernel entry agrees with the exact-SVD
  engine at the usual tolerance.

Reference anchor: the truncation semantics being approximated are
cuTensorNet's truncation_fidelity (gpu_backend/kernel_state_ansatz.py:
141-144) and ITensors' cutoff (KernelPkg/src/KernelPkg.jl:68); oversampling
changes only which subspace realizes them, never the masking rule.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import build_schedule
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import simulate_one, tile_overlaps_sq
from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops.svd import truncated_svd


def _rand_theta(rng, m, k, spectrum):
    """Random complex [m, k] with the given singular spectrum."""
    a = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    b = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
    u, _ = np.linalg.qr(a)
    v, _ = np.linalg.qr(b)
    r = len(spectrum)
    th = (u[:, :r] * np.asarray(spectrum)) @ v[:, :r].conj().T
    return Cpx(jnp.asarray(th.real), jnp.asarray(th.imag))


def _reconstruct(left, right):
    got = cpx.einsum("ij,jk->ik", left, right)
    return cpx.to_np(got)


def _to_np(theta):
    return np.asarray(theta.re) + 1j * np.asarray(theta.im)


def test_exact_rank_regime_still_exact():
    rng = np.random.default_rng(0)
    spectrum = [3.0, 1.0, 0.5, 0.25, 0.1, 0.05]  # rank 6 < keep 8
    theta = _rand_theta(rng, 16, 12, spectrum)
    for p in (0, 8):
        cfg = SimConfig(chi=8, precision="f64", svd_method="subspace", oversample=p)
        left, right, kf, rank = truncated_svd(theta, cfg, keep=8)
        np.testing.assert_allclose(
            _reconstruct(left, right), _to_np(theta), atol=1e-10
        )
        assert float(kf) == pytest.approx(1.0, abs=1e-12)
        assert int(rank) == 6


def test_oversampled_capture_at_least_plain():
    """Slowly decaying spectrum, hard truncation: the oversampled subspace
    must capture at least the plain subspace's squared weight."""
    rng = np.random.default_rng(7)
    spectrum = [0.95**i for i in range(24)]  # flat near every cut
    theta = _rand_theta(rng, 32, 32, spectrum)
    keep = 8
    # f32 + single iteration: the regime where the plain subspace is least
    # converged and oversampling has the most to win.
    base = dict(chi=keep, precision="f32", svd_method="subspace", subspace_iters=1)
    kfs = {}
    for p in (0, 8):
        cfg = SimConfig(oversample=p, **base)
        th32 = Cpx(theta.re.astype(jnp.float32), theta.im.astype(jnp.float32))
        left, right, kf, _ = truncated_svd(th32, cfg, keep=keep)
        kfs[p] = float(kf)
        # structural invariants after the gather
        q = _to_np(left)
        col_norms = np.linalg.norm(q, axis=0)
        kept = col_norms > 0.5
        assert kept.sum() == keep  # nothing masked in this regime
        np.testing.assert_allclose(
            q[:, kept].conj().T @ q[:, kept], np.eye(int(kept.sum())), atol=1e-5
        )
        np.testing.assert_allclose(
            _reconstruct(left, right),
            q @ (q.conj().T @ _to_np(th32)),
            atol=1e-5,
        )
    assert kfs[8] >= kfs[0] - 1e-7


def test_mask_zeroing_survives_gather():
    """Rank below keep + aggressive eps: discarded oversampled directions
    and eps-masked directions are EXACT zeros in both factors."""
    rng = np.random.default_rng(3)
    spectrum = [1.0, 0.5, 1e-9, 1e-10]
    theta = _rand_theta(rng, 16, 16, spectrum)
    cfg = SimConfig(
        chi=6, precision="f64", svd_method="subspace", oversample=8,
        truncation_error=1e-12,
    )
    left, right, kf, rank = truncated_svd(theta, cfg, keep=6)
    assert int(rank) == 2
    q = _to_np(left)
    r = _to_np(right)
    dead = np.linalg.norm(q, axis=0) == 0.0
    assert dead.sum() == 4  # keep - rank columns exactly zero
    assert np.all(r[dead, :] == 0.0)
    np.testing.assert_allclose(float(kf), 1.0, atol=1e-12)


def test_fused_kernel_routes_oversampled_width():
    """With keep+p panel-aligned (PANEL=16) the fused Pallas kernel carries
    the widened iterate; interpret mode pins the real routing on CPU CI.
    Fused and unfused must agree to f32 roundoff."""
    rng = np.random.default_rng(11)
    spectrum = [0.9**i for i in range(20)]
    theta = _rand_theta(rng, 32, 32, spectrum)
    th32 = Cpx(theta.re.astype(jnp.float32), theta.im.astype(jnp.float32))
    keep, p = 16, 16  # nc = 32, multiple of PANEL=16
    from qml_cutensornet_tpu.ops.pallas_split import fused_split_supported

    assert fused_split_supported(32, 32, keep + p, jnp.float32, 1, interpret=True)
    outs = {}
    for fused in (False, True):
        cfg = SimConfig(
            chi=keep, precision="f32", svd_method="subspace",
            subspace_iters=1, oversample=p, fused_split=fused,
            fused_interpret=fused,
        )
        left, right, kf, rank = truncated_svd(th32, cfg, keep=keep)
        outs[fused] = (_reconstruct(left, right), float(kf), int(rank))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=2e-5)
    assert outs[True][1] == pytest.approx(outs[False][1], abs=1e-6)
    assert outs[True][2] == outs[False][2]


@pytest.mark.parametrize("p", [8])
def test_engine_kernel_parity_with_oversample(p):
    """Full circuit + kernel entry through the engine with oversampling on,
    against the exact-SVD engine (f64, truncating chi)."""
    n, reps, nn, gamma = 6, 2, 2, 1.0
    rng = np.random.default_rng(42)
    emap = entanglement_graph(n, nn)
    sched = build_schedule(n, reps, gamma, emap, hadamard_init=True, routing="tracked")
    x = jnp.asarray(rng.uniform(0.0, 2.0, size=(2, n)))
    chi = 4  # truncating: exact chi is 8
    kernels = {}
    for tag, kw in {
        "svd": dict(svd_method="svd"),
        "over": dict(svd_method="subspace", oversample=p),
    }.items():
        cfg = SimConfig(chi=chi, precision="f64", **kw)
        states = [simulate_one(x[i], sched, cfg) for i in range(2)]
        t = Cpx(
            jnp.stack([s.tensors.re for s in states]),
            jnp.stack([s.tensors.im for s in states]),
        )
        k = np.asarray(tile_overlaps_sq(t, t))
        kernels[tag] = k
        assert all(float(s.fidelity) > 0.9 for s in states)
    np.testing.assert_allclose(kernels["over"], kernels["svd"], atol=5e-3)
    # diagonal of |<psi_i|psi_i>|^2 is norm^4: both engines must agree there
    np.testing.assert_allclose(
        np.diag(kernels["over"]), np.diag(kernels["svd"]), atol=5e-3
    )
