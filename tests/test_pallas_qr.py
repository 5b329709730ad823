"""Numerics of the Pallas BCGS2 orthonormalizer (ops/pallas_qr.py), run in
interpreter mode on CPU so CI covers the kernel logic without a TPU.

The quality bar is the Householder path it replaces: orthonormal columns to
O(eps32), span preserved (residual (I-QQ^H)V ~ eps32), exact zeros for
padding columns — plus the stronger guarantee Householder does NOT give:
numerically dependent columns come back EXACTLY zero instead of as noise
junk."""

import numpy as np
import pytest

import jax.numpy as jnp

from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops.pallas_qr import orthonormalize_batched


@pytest.fixture(params=[False, True], ids=["mgs", "mgspair"])
def pair_mode(request, monkeypatch):
    """Run every numerics test under both within-panel variants: the
    serial MGS2 loop and the block-2 pair variant (QMLTPU_MGS_PAIR) —
    same span/invariant contract, different f32 summation order."""
    monkeypatch.setenv("QMLTPU_MGS_PAIR", "1" if request.param else "0")
    return request.param


def _orth(vc):
    v = Cpx(jnp.asarray(vc.real, jnp.float32), jnp.asarray(vc.imag, jnp.float32))
    q = orthonormalize_batched(v, interpret=True)
    return np.asarray(q.re) + 1j * np.asarray(q.im)


def _checks(vc, qc, orth_tol=5e-6, span_tol=5e-6):
    B = vc.shape[0]
    for b in range(B):
        nz = np.linalg.norm(qc[b], axis=0) > 0.5
        g = qc[b][:, nz].conj().T @ qc[b][:, nz]
        assert np.abs(g - np.eye(nz.sum())).max() < orth_tol
        proj = qc[b] @ (qc[b].conj().T @ vc[b])
        scale = max(np.abs(vc[b]).max(), 1e-30)
        assert np.abs(vc[b] - proj).max() / scale < span_tol


def test_random_full_rank(pair_mode):
    rng = np.random.default_rng(0)
    vc = rng.standard_normal((3, 128, 32)) + 1j * rng.standard_normal((3, 128, 32))
    _checks(vc, _orth(vc))


def test_ill_conditioned_spectrum(pair_mode):
    rng = np.random.default_rng(1)
    m, k = 128, 32
    u, _ = np.linalg.qr(rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k)))
    w, _ = np.linalg.qr(rng.standard_normal((k, k)) + 1j * rng.standard_normal((k, k)))
    s = np.logspace(0, -5, k)
    vc = ((u * s) @ w.conj().T)[None]
    _checks(vc, _orth(vc), orth_tol=2e-5, span_tol=2e-4)


def test_rank_deficient_zeros_not_junk(pair_mode):
    """Numerically dependent columns must come back EXACTLY zero (GS junk
    duplicates destroyed MPS states in the engine; zeros are inert)."""
    rng = np.random.default_rng(2)
    m, k, r = 128, 32, 5
    base = rng.standard_normal((m, r)) + 1j * rng.standard_normal((m, r))
    mix = rng.standard_normal((r, k))
    vc = (base @ mix)[None]  # rank r
    qc = _orth(vc)
    norms = np.linalg.norm(qc[0], axis=0)
    assert (norms > 0.5).sum() == r
    # dependent columns: exactly zero, not junk
    assert np.abs(qc[0][:, norms < 0.5]).max() == 0.0
    _checks(vc, qc, span_tol=1e-5)


def test_exact_zero_padding_preserved(pair_mode):
    rng = np.random.default_rng(3)
    vc = rng.standard_normal((2, 128, 32)) + 0j
    vc[:, :, 16:] = 0.0
    qc = _orth(vc)
    assert np.abs(qc[:, :, 16:]).max() == 0.0
    _checks(vc, qc)


def test_batch_padding_roundtrip(pair_mode):
    """B not a multiple of the internal block: results must match a
    one-at-a-time reference."""
    rng = np.random.default_rng(4)
    vc = rng.standard_normal((5, 128, 16)) + 1j * rng.standard_normal((5, 128, 16))
    q_all = _orth(vc)
    for b in range(5):
        q_one = _orth(vc[b : b + 1])
        np.testing.assert_allclose(q_all[b], q_one[0], atol=1e-6)


def test_fused_r_factor_reconstructs(pair_mode):
    """orthonormalize_r_batched: q r must equal v to roundoff (the cpx.qr
    contract — r is NOT triangular, no caller relies on that), including
    on rank-deficient input where dependent q columns are zeroed."""
    from qml_cutensornet_tpu.ops.pallas_qr import orthonormalize_r_batched

    rng = np.random.default_rng(5)
    full = rng.standard_normal((2, 64, 32)) + 1j * rng.standard_normal((2, 64, 32))
    base = rng.standard_normal((64, 5)) + 1j * rng.standard_normal((64, 5))
    lowrank = (base @ rng.standard_normal((5, 32)))[None]
    for vc in (full, lowrank):
        v = Cpx(jnp.asarray(vc.real, jnp.float32), jnp.asarray(vc.imag, jnp.float32))
        q, r = orthonormalize_r_batched(v, interpret=True)
        qc = np.asarray(q.re) + 1j * np.asarray(q.im)
        rc = np.asarray(r.re) + 1j * np.asarray(r.im)
        scale = np.abs(vc).max()
        assert np.abs(qc @ rc - vc).max() / scale < 5e-6
        _checks(vc, qc, span_tol=1e-5)
