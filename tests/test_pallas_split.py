"""Numerics of the FUSED subspace-split kernel (ops/pallas_split.py), run
in interpreter mode on CPU so CI covers the kernel logic without a TPU.

The contract is the one ops/svd._split_subspace relies on: ``q`` is a
masked isometry whose span approximates the top-``keep`` left singular
subspace, ``r = q^H theta``, and ``q r`` is the corresponding truncation
of theta — EXACT (to f32 roundoff) when rank(theta) <= keep. The fused
kernel must match the unfused chain (same v0, same BCGS2 body, XLA
matmuls) to f32-accumulation tolerance, and preserve the exact-zero
invariants (zero rows/columns of theta never produce junk)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.pallas_qr import orthonormalize_batched
from qml_cutensornet_tpu.ops.pallas_split import subspace_factor_batched
from qml_cutensornet_tpu.ops.svd import _subspace_start


def _as_cpx(a):
    return Cpx(jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32))


def _v0(m, keep):
    re, im = _subspace_start(m, keep, "float32")
    return Cpx(jnp.asarray(re), jnp.asarray(im))


def _fused(thc, keep):
    th = _as_cpx(thc)
    q, r = subspace_factor_batched(th, _v0(thc.shape[1], keep), keep, interpret=True)
    qc = np.asarray(q.re) + 1j * np.asarray(q.im)
    rc = np.asarray(r.re) + 1j * np.asarray(r.im)
    return qc, rc


def _unfused(thc, keep):
    """The exact unfused TPU chain: XLA matmuls + the same BCGS2 kernel
    (interpret mode) for both orthonormalizations."""
    th = _as_cpx(thc)
    v0 = _v0(thc.shape[1], keep)
    B = thc.shape[0]
    v = Cpx(jnp.broadcast_to(v0.re, (B, *v0.re.shape)),
            jnp.broadcast_to(v0.im, (B, *v0.im.shape)))
    w = cpx.einsum("bij,bik->bjk", cpx.conj(th), v)
    w = orthonormalize_batched(w, interpret=True)
    v = cpx.einsum("bij,bjk->bik", th, w)
    q = orthonormalize_batched(v, interpret=True)
    r = cpx.einsum("bmi,bmk->bik", cpx.conj(q), th)
    qc = np.asarray(q.re) + 1j * np.asarray(q.im)
    rc = np.asarray(r.re) + 1j * np.asarray(r.im)
    return qc, rc


def _rand_theta(rng, B, m, k, rank=None):
    if rank is None:
        rank = min(m, k)
    a = rng.standard_normal((B, m, rank)) + 1j * rng.standard_normal((B, m, rank))
    b = rng.standard_normal((B, rank, k)) + 1j * rng.standard_normal((B, rank, k))
    th = a @ b
    return th / np.abs(th).max()


def test_matches_unfused_chain():
    """Same algorithm, same start block: fused vs unfused agree to f32
    accumulation noise (the only delta is dot summation order)."""
    rng = np.random.default_rng(0)
    thc = _rand_theta(rng, 3, 64, 64)
    qf, rf = _fused(thc, 32)
    qu, ru = _unfused(thc, 32)
    np.testing.assert_allclose(qf, qu, atol=2e-5)
    np.testing.assert_allclose(rf, ru, atol=2e-5)


def test_pair_variant_exact_factorization(monkeypatch):
    """QMLTPU_MGS_PAIR=1 (block-2 within-panel BCGS2) through the fused
    split: same exact-factorization and isometry contract as the scalar
    variant — rank(theta) <= keep must reconstruct to f32 roundoff and
    dependent columns must stay exactly zero."""
    monkeypatch.setenv("QMLTPU_MGS_PAIR", "1")
    rng = np.random.default_rng(11)
    for m, k, keep, rank in [(64, 64, 32, 20), (128, 96, 32, 7)]:
        thc = _rand_theta(rng, 2, m, k, rank=rank)
        qc, rc = _fused(thc, keep)
        assert np.abs(qc @ rc - thc).max() < 5e-6, (m, k, keep, rank)
        for b in range(2):
            norms = np.linalg.norm(qc[b], axis=0)
            nz = norms > 0.5
            assert nz.sum() == min(rank, keep)
            g = qc[b][:, nz].conj().T @ qc[b][:, nz]
            assert np.abs(g - np.eye(nz.sum())).max() < 5e-6
            assert np.abs(qc[b][:, ~nz]).max() == 0.0


def test_exact_factorization_when_rank_fits():
    """rank(theta) <= keep: q r must reconstruct theta to f32 roundoff
    (the no-truncation regime the 1e-6 parity ledger lives in)."""
    rng = np.random.default_rng(1)
    for m, k, keep, rank in [(64, 64, 32, 20), (128, 128, 64, 64), (128, 96, 32, 7)]:
        thc = _rand_theta(rng, 2, m, k, rank=rank)
        qc, rc = _fused(thc, keep)
        rec = qc @ rc
        assert np.abs(rec - thc).max() < 5e-6, (m, k, keep, rank)
        # isometry on the nonzero columns
        for b in range(2):
            nz = np.linalg.norm(qc[b], axis=0) > 0.5
            g = qc[b][:, nz].conj().T @ qc[b][:, nz]
            assert np.abs(g - np.eye(nz.sum())).max() < 5e-6


def test_truncation_captures_top_subspace():
    """With rank > keep, q must capture the top-keep singular directions:
    the residual weight equals the discarded spectrum's weight."""
    rng = np.random.default_rng(2)
    m = k = 64
    keep = 16
    u, _ = np.linalg.qr(rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m)))
    w, _ = np.linalg.qr(rng.standard_normal((k, k)) + 1j * rng.standard_normal((k, k)))
    s = np.concatenate([np.linspace(1.0, 0.5, keep), 1e-4 * np.ones(m - keep)])
    thc = ((u * s) @ w.conj().T)[None]
    qc, rc = _fused(thc, keep)
    resid = np.abs(thc - qc @ rc) ** 2
    assert resid.sum() < 2 * (s[keep:] ** 2).sum()


def test_zero_padding_stays_zero():
    """Exact-zero trailing rows AND columns of theta (bond padding) must
    produce exactly-zero q rows / r columns — the MPS padding invariant."""
    rng = np.random.default_rng(3)
    thc = _rand_theta(rng, 2, 64, 64, rank=10)
    thc[:, 40:, :] = 0.0
    thc[:, :, 48:] = 0.0
    qc, rc = _fused(thc, 32)
    assert np.abs(qc[:, 40:, :]).max() == 0.0
    assert np.abs(rc[:, :, 48:]).max() == 0.0
    rec = qc @ rc
    assert np.abs(rec - thc).max() < 5e-6


def test_batch_padding_roundtrip():
    """B not a multiple of the internal block: results must match a
    one-at-a-time reference."""
    rng = np.random.default_rng(4)
    thc = _rand_theta(rng, 5, 64, 64)
    q_all, r_all = _fused(thc, 16)
    for b in range(5):
        q_one, r_one = _fused(thc[b : b + 1], 16)
        np.testing.assert_allclose(q_all[b], q_one[0], atol=1e-6)
        np.testing.assert_allclose(r_all[b], r_one[0], atol=1e-6)


@pytest.mark.parametrize("iters", [1, 2])
def test_end_to_end_gram_via_svd_routing(monkeypatch, iters):
    """Drive the REAL production path (ops/svd._split_subspace routing +
    simulate + gram) through the fused kernels in interpret mode and pin
    it against the default engine: same Gram to f32 accumulation noise.
    iters=2 is the CLI default config (QMLTPU_SUBSPACE_ITERS). The fused
    knobs are SimConfig fields (static jit args), so the two builds below
    can never alias each other's traces. Counters assert the fused
    kernels actually ran — chi/staging are chosen so the split shape
    ([32, 32], keep=16) is kernel-eligible."""
    import numpy as np

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.ops import pallas_qr, pallas_split, svd

    # Single-stage execution at the full cap: staged-chi would run the
    # ramp-up stages at keep < 16, below the kernel's PANEL alignment.
    monkeypatch.setenv("QMLTPU_STAGED", "0")

    # Another test with an equal SimConfig may already have traced this
    # engine path; call counters only fire at trace time.
    jax.clear_caches()
    calls = {"split": 0, "qr_r": 0}
    real_split = pallas_split.subspace_factor
    real_qr_r = pallas_qr.qr_with_r_pallas

    def counting_split(*a, **k):
        calls["split"] += 1
        return real_split(*a, **k)

    def counting_qr_r(*a, **k):
        calls["qr_r"] += 1
        return real_qr_r(*a, **k)

    monkeypatch.setattr(pallas_split, "subspace_factor", counting_split)
    monkeypatch.setattr(pallas_qr, "qr_with_r_pallas", counting_qr_r)

    nq = 8
    rng = np.random.default_rng(7)
    X = rng.uniform(0.0, 2.0, size=(4, nq))
    ansatz = KernelStateAnsatz(nq, 1, 1.0, entanglement_graph(nq, 2))
    fused_cfg = SimConfig(chi=16, precision="f32", svd_method="subspace",
                          subspace_iters=iters, fused_split=True,
                          fused_interpret=True)
    k_fused = build_kernel_matrix(ansatz, X, cfg=fused_cfg, sim_batch=4, tile=4)
    assert calls["split"] > 0, "fused split kernel never engaged"

    plain_cfg = SimConfig(chi=16, precision="f32", svd_method="subspace",
                          subspace_iters=iters)
    k_plain = build_kernel_matrix(ansatz, X, cfg=plain_cfg, sim_batch=4, tile=4)
    np.testing.assert_allclose(k_fused, k_plain, atol=3e-5)
    assert np.abs(k_fused - k_plain).max() > 0.0, (
        "identical kernels: the fused path cannot have produced these"
    )


def test_cfg_mgs_pair_threads_without_env(monkeypatch):
    """SimConfig.mgs_pair is a STATIC config choice threaded through every
    Pallas orthonormalization (like fused_split): on the engine path the
    QMLTPU_MGS_PAIR env fallback (pallas_qr.mgs_pair, the ``pair=None``
    convenience for direct ops-module users) must never be consulted at
    trace time — an env read baked into a jitted caller's jaxpr cache goes
    stale on in-process flips (the round-3 deferred review finding). The
    pair-variant Gram must also agree with the scalar variant to f32
    accumulation noise (same span, different summation order)."""
    import numpy as np

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.ops import pallas_qr

    monkeypatch.setenv("QMLTPU_STAGED", "0")
    jax.clear_caches()

    def _no_env_fallback():
        raise AssertionError(
            "pallas_qr.mgs_pair() env fallback consulted on the "
            "cfg-threaded engine path"
        )

    monkeypatch.setattr(pallas_qr, "mgs_pair", _no_env_fallback)

    nq = 8
    rng = np.random.default_rng(7)
    X = rng.uniform(0.0, 2.0, size=(4, nq))
    ansatz = KernelStateAnsatz(nq, 1, 1.0, entanglement_graph(nq, 2))
    base = dict(chi=16, precision="f32", svd_method="subspace",
                fused_split=True, fused_interpret=True)
    k_pair = build_kernel_matrix(
        ansatz, X, cfg=SimConfig(mgs_pair=True, **base), sim_batch=4, tile=4)
    k_scalar = build_kernel_matrix(
        ansatz, X, cfg=SimConfig(mgs_pair=False, **base), sim_batch=4, tile=4)
    np.testing.assert_allclose(k_pair, k_scalar, atol=3e-5)


def test_brick_engine_with_fused_kernels(monkeypatch):
    """The brick (Vidal/Hastings) engine flattens layer pairs into one
    vmap level over truncated_split_right — the fused kernel must map that
    whole [B*K] batch into kernel launches and agree with the unfused
    brick engine. This is the flagship nq>=100 routing; pin it before any
    TPU default flip."""
    import numpy as np

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.ops import pallas_split

    monkeypatch.setenv("QMLTPU_STAGED", "0")
    # Another test with an equal SimConfig may already have traced this
    # engine path; call counters only fire at trace time.
    jax.clear_caches()
    calls = {"split": 0}
    real_split = pallas_split.subspace_factor

    def counting_split(*a, **k):
        calls["split"] += 1
        return real_split(*a, **k)

    monkeypatch.setattr(pallas_split, "subspace_factor", counting_split)

    nq = 8
    rng = np.random.default_rng(9)
    X = rng.uniform(0.0, 2.0, size=(3, nq))
    ansatz = KernelStateAnsatz(nq, 1, 1.0, entanglement_graph(nq, 2),
                               routing="brick")
    fused_cfg = SimConfig(chi=16, precision="f32", svd_method="subspace",
                          subspace_iters=1, fused_split=True,
                          fused_interpret=True)
    k_fused = build_kernel_matrix(ansatz, X, cfg=fused_cfg, sim_batch=3, tile=3)
    assert calls["split"] > 0, "fused split kernel never engaged in brick mode"

    plain_cfg = SimConfig(chi=16, precision="f32", svd_method="subspace",
                          subspace_iters=1)
    k_plain = build_kernel_matrix(ansatz, X, cfg=plain_cfg, sim_batch=3, tile=3)
    np.testing.assert_allclose(k_fused, k_plain, atol=3e-5)
