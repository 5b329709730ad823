"""Numerics of the fused GATE + theta-build + split kernel (phase 2,
ops/pallas_split._make_gate_split_kernel), in interpret mode on CPU.

Phase 2 moves the theta construction (site-tensor contraction + two-site
gate application) into the same Pallas launch as the subspace split, so
theta never exists in HBM. The contract: apply_2site under
``cfg.fused_gate`` must produce the SAME updated pair of site tensors as
the phase-1 path (theta built by XLA einsums) up to f32 summation-order
noise — including both canonical-center directions (the theta^T feed:
svd.truncated_svd_gate docstring), every engine gate kind, exact-zero
bond padding, oversampling, and iters=2.

Comparisons contract the updated pair back into the two-site wavefunction
(``new_a . new_b``) — gauge-invariant, so basis rotations inside
degenerate Schmidt clusters cannot flake the test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.ops import cpx, gates, mps as mps_ops
from qml_cutensornet_tpu.ops.cpx import Cpx


CHI = 16


def _cfg(fused_gate, **kw):
    kw.setdefault("subspace_iters", 1)
    return SimConfig(
        chi=CHI, precision="f32", svd_method="subspace",
        fused_split=True, fused_gate=fused_gate, fused_interpret=True, **kw
    )


def _rand_mps(rng, n, chi, rank=None):
    """Random padded MPS with exact-zero entries beyond ``rank`` on every
    bond (the engine's padding invariant)."""
    r = chi if rank is None else rank
    t = rng.standard_normal((n, chi, 2, chi)) + 1j * rng.standard_normal(
        (n, chi, 2, chi)
    )
    t[:, r:, :, :] = 0.0
    t[:, :, :, r:] = 0.0
    t[0, 1:, :, :] = 0.0  # boundary bonds are 1-dimensional
    t[-1, :, :, 1:] = 0.0
    t /= np.abs(t).max()
    tensors = Cpx(jnp.asarray(t.real, jnp.float32), jnp.asarray(t.imag, jnp.float32))
    return mps_ops.MPS(
        tensors=tensors,
        fidelity=jnp.asarray(1.0, jnp.float32),
        bond_dims=jnp.full((n - 1,), r, jnp.int32),
    )


def _pair_wavefn(state, site):
    """Contract sites (site, site+1) into the gauge-invariant two-site
    block [chi, 2, 2, chi] as a numpy complex array."""
    t = np.asarray(state.tensors.re) + 1j * np.asarray(state.tensors.im)
    return np.einsum("asb,btc->astc", t[site], t[site + 1])


def _gates(rdt):
    rng = np.random.default_rng(11)
    u, _ = np.linalg.qr(
        rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    )
    rand_u = Cpx(jnp.asarray(u.real, rdt), jnp.asarray(u.imag, rdt))
    return {
        "xxphase": gates.xxphase(jnp.asarray(0.7, rdt), rdt),
        "swap": gates.swap(rdt),
        "zzphase": gates.zzphase(jnp.asarray(-1.3, rdt), rdt),
        "random_unitary": rand_u,
    }


@pytest.mark.parametrize("direction", [None, 0, 1])
@pytest.mark.parametrize("gname", ["xxphase", "swap", "zzphase", "random_unitary"])
def test_apply_2site_matches_phase1(direction, gname):
    """Fused-gate apply_2site == phase-1 apply_2site on the contracted
    pair, fidelity, and rank — both directions, every gate kind."""
    rng = np.random.default_rng(5)
    state = _rand_mps(rng, 4, CHI, rank=6)
    u4 = _gates(jnp.float32)[gname]

    out_g = mps_ops.apply_2site(state, 1, u4, _cfg(True), direction)
    out_p = mps_ops.apply_2site(state, 1, u4, _cfg(False), direction)

    np.testing.assert_allclose(
        _pair_wavefn(out_g, 1), _pair_wavefn(out_p, 1), atol=3e-5
    )
    np.testing.assert_allclose(
        float(out_g.fidelity), float(out_p.fidelity), atol=1e-5
    )
    assert int(out_g.bond_dims[1]) == int(out_p.bond_dims[1])
    # Sites outside the pair are untouched.
    np.testing.assert_array_equal(
        np.asarray(out_g.tensors.re[0]), np.asarray(state.tensors.re[0])
    )


def test_zero_padding_stays_zero():
    """Bond padding beyond the state's true rank must stay EXACTLY zero
    through the fused-gate update (the contraction-corruption invariant)."""
    rng = np.random.default_rng(6)
    rank = 4
    state = _rand_mps(rng, 4, CHI, rank=rank)
    u4 = _gates(jnp.float32)["xxphase"]
    out = mps_ops.apply_2site(state, 1, u4, _cfg(True), 0)
    na = np.asarray(out.tensors.re[1]) + 1j * np.asarray(out.tensors.im[1])
    nb = np.asarray(out.tensors.re[2]) + 1j * np.asarray(out.tensors.im[2])
    # Outer bonds keep the old rank padding; the gate cannot grow them.
    assert np.abs(na[rank:, :, :]).max() == 0.0
    assert np.abs(nb[:, :, rank:]).max() == 0.0


@pytest.mark.parametrize("direction", [0, 1])
def test_degenerate_spectrum_reconstructs(direction):
    """Bell-pair-like (exactly degenerate) Schmidt spectra: the truncated
    product must still reconstruct the exact two-site wavefunction when
    rank <= keep (gauge-invariant check)."""
    state = mps_ops.zero_state(4, _cfg(True))
    h = gates.hadamard(jnp.float32)
    state = mps_ops.apply_1q(state, 1, h)
    # CNOT-like entangler: XXPhase(pi/2) makes a maximally entangled pair.
    u4 = gates.xxphase(jnp.asarray(np.pi / 2, jnp.float32), jnp.float32)

    before = np.einsum(
        "stuv,auvc->astc",
        (np.asarray(u4.re) + 1j * np.asarray(u4.im)).reshape(2, 2, 2, 2),
        _pair_wavefn(state, 1),
    )
    out = mps_ops.apply_2site(state, 1, u4, _cfg(True), direction)
    np.testing.assert_allclose(_pair_wavefn(out, 1), before, atol=3e-6)


@pytest.mark.parametrize("swap_w", [0.0, 1.0])
@pytest.mark.parametrize("iters,oversample", [(1, 0), (2, 16)])
def test_brick_update_pairs_matches_xla(swap_w, iters, oversample):
    """Phase 2b: the fused brick pair update (theta build + gate + lambda
    weight + right split + Hastings new_a in one launch) must match the
    XLA update_pairs on the contracted pair product (gauge-invariant),
    the Schmidt weights, kept fraction, and rank."""
    from qml_cutensornet_tpu.ops import vidal

    rng = np.random.default_rng(12)
    B, K, chi, rank = 2, 3, CHI, 5

    def mk(shape, r):
        t = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        t[..., r:, :, :] = 0.0
        t[..., :, :, r:] = 0.0
        t /= np.abs(t).max()
        return Cpx(jnp.asarray(t.real, jnp.float32), jnp.asarray(t.imag, jnp.float32))

    a = mk((B, K, chi, 2, chi), rank)
    b = mk((B, K, chi, 2, chi), rank)
    lam = np.zeros((B, K, chi), np.float32)
    lam[..., :rank] = rng.uniform(0.3, 1.0, size=(B, K, rank))
    lam = jnp.asarray(lam)
    thetas = jnp.asarray(rng.uniform(-1.0, 1.0, size=(B, K)), jnp.float32)
    sw = jnp.asarray(swap_w, jnp.float32)

    outs = {}
    for tag, fused in (("gate", True), ("plain", False)):
        cfg = _cfg(fused, subspace_iters=iters, oversample=oversample)
        na, nb, s, kf, rk = vidal.update_pairs(a, b, lam, thetas, sw, cfg)
        prod = np.einsum(
            "bkasc,bkctd->bkastd",
            np.asarray(na.re) + 1j * np.asarray(na.im),
            np.asarray(nb.re) + 1j * np.asarray(nb.im),
        )
        outs[tag] = (prod, np.asarray(s), np.asarray(kf), np.asarray(rk))

    np.testing.assert_allclose(outs["gate"][0], outs["plain"][0], atol=3e-5)
    np.testing.assert_allclose(
        np.sort(outs["gate"][1], axis=-1), np.sort(outs["plain"][1], axis=-1),
        atol=3e-5,
    )
    np.testing.assert_allclose(outs["gate"][2], outs["plain"][2], atol=1e-5)
    np.testing.assert_array_equal(outs["gate"][3], outs["plain"][3])


def test_brick_engine_end_to_end(monkeypatch):
    """Brick-routed Gram through the real engine with fused_gate on,
    pinned against the plain brick engine; counter asserts the phase-2b
    kernel ran."""
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.ops import pallas_split

    monkeypatch.setenv("QMLTPU_STAGED", "0")
    # Another test with an equal SimConfig may already have traced this
    # engine path; call counters only fire at trace time.
    jax.clear_caches()
    calls = {"brick": 0}
    real = pallas_split.brick_gate_split_batched

    def counting(*a, **k):
        calls["brick"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pallas_split, "brick_gate_split_batched", counting)

    nq = 8
    rng = np.random.default_rng(13)
    X = rng.uniform(0.0, 2.0, size=(3, nq))
    ansatz = KernelStateAnsatz(nq, 1, 1.0, entanglement_graph(nq, 2),
                               routing="brick")
    k_gate = build_kernel_matrix(ansatz, X, cfg=_cfg(True), sim_batch=3, tile=3)
    assert calls["brick"] > 0, "phase-2b brick kernel never engaged"

    k_plain = build_kernel_matrix(ansatz, X, cfg=_cfg(False), sim_batch=3, tile=3)
    np.testing.assert_allclose(k_gate, k_plain, atol=3e-5)


@pytest.mark.parametrize("iters,oversample", [(1, 0), (2, 0), (1, 16)])
def test_end_to_end_gram_via_engine(monkeypatch, iters, oversample):
    """Drive the real engine routing (simulate + gram) with fused_gate on
    and pin the Gram against the phase-1 engine; a counter asserts the
    phase-2 kernel actually ran."""
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.ops import pallas_split

    monkeypatch.setenv("QMLTPU_STAGED", "0")
    # Another test with an equal SimConfig may already have traced this
    # engine path; call counters only fire at trace time.
    jax.clear_caches()
    calls = {"gate": 0}
    real = pallas_split.gate_subspace_factor

    def counting(*a, **k):
        calls["gate"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pallas_split, "gate_subspace_factor", counting)

    nq = 8
    rng = np.random.default_rng(7)
    X = rng.uniform(0.0, 2.0, size=(4, nq))
    ansatz = KernelStateAnsatz(nq, 1, 1.0, entanglement_graph(nq, 2))
    k_gate = build_kernel_matrix(
        ansatz, X,
        cfg=_cfg(True, subspace_iters=iters, oversample=oversample),
        sim_batch=4, tile=4,
    )
    assert calls["gate"] > 0, "phase-2 gate-split kernel never engaged"

    k_plain = build_kernel_matrix(
        ansatz, X,
        cfg=_cfg(False, subspace_iters=iters, oversample=oversample),
        sim_batch=4, tile=4,
    )
    np.testing.assert_allclose(k_gate, k_plain, atol=3e-5)
