"""Brick-parallel (Vidal/Hastings) engine: schedule invariants and parity.

The brick path replaces the sequential op stream with layers of disjoint
two-site updates (ops/vidal.py, models/ansatz.py:_raw_brick) — the
TPU-native answer to the reference's per-circuit native-call hot loop
(gpu_backend/kernel_state_ansatz.py:217-226) in the nq>=100 regime where
dispatch overhead dominates."""

import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import BrickSchedule, KernelStateAnsatz, build_schedule
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import make_chunked_simulator, tile_overlaps_sq
from qml_cutensornet_tpu.ops import dense


@pytest.mark.parametrize("n,reps,d", [(6, 2, 1), (8, 2, 2), (9, 3, 3), (12, 2, 4), (10, 2, 6)])
def test_brick_schedule_invariants(n, reps, d):
    """Replay the layer stream: pairs disjoint per layer, every map pair
    fires exactly once per rep, final_pos matches the replayed permutation."""
    emap = entanglement_graph(n, d)
    s = build_schedule(n, reps, 1.0, emap, routing="brick")
    assert isinstance(s, BrickSchedule)
    at = np.arange(n)
    fired_per_rep = []
    for br in s.bricks:
        assert np.array_equal(br.pos_to_feature, at), "rep must start at tracked layout"
        fired = set()
        for li in range(len(br.parities)):
            par = int(br.parities[li])
            ks = np.nonzero(br.active[li])[0]
            sites = par + 2 * ks - 1  # padded left site -> real site
            assert all(0 <= st <= n - 2 for st in sites)
            for k in ks:
                st = int(par + 2 * k - 1)
                if br.fire[li][k]:
                    qa, qb = at[st], at[st + 1]
                    assert {br.fa[li][k], br.fb[li][k]} == {qa, qb}
                    fired.add((min(qa, qb), max(qa, qb)))
                if br.swaps[li]:
                    at[st], at[st + 1] = at[st + 1], at[st]
        fired_per_rep.append(fired)
    for fired in fired_per_rep:
        assert fired == {(min(a, b), max(a, b)) for (a, b) in emap}
    pos = np.empty(n, int)
    pos[at] = np.arange(n)
    assert np.array_equal(pos, s.final_pos)


@pytest.mark.parametrize("n,reps,d", [(6, 2, 1), (8, 2, 3), (10, 2, 4)])
def test_brick_matches_dense_f64(n, reps, d):
    """At adequate chi and f64 the brick engine is exact vs the dense
    statevector golden (normalized kernel entries)."""
    rng = np.random.default_rng(5)
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(4, n))
    cfg = SimConfig(
        chi=2 ** (n // 2), truncation_error=1e-16, precision="f64",
        svd_method="subspace", subspace_iters=2,
    )
    st = make_chunked_simulator(ansatz.schedule, cfg)(X)
    assert float(np.asarray(st.fidelity).min()) > 1 - 1e-12
    k = np.asarray(tile_overlaps_sq(st.tensors, st.tensors))
    dg = np.sqrt(np.diag(k))
    kn = k / np.outer(dg, dg)
    kd = np.array(
        [[dense.kernel_entry(X[i], X[j], reps, 1.0, emap) for j in range(4)] for i in range(4)]
    )
    assert np.abs(kn - kd).max() < 1e-9


def test_brick_f32_parity_and_gram_integration():
    """f32 brick kernel through build_kernel_matrix agrees with the tracked
    engine's kernel at matching accuracy scale (both vs dense)."""
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix

    rng = np.random.default_rng(11)
    n, reps, d = 12, 2, 3
    emap = entanglement_graph(n, d)
    X = rng.uniform(0, 2, size=(8, n))
    kd = np.array(
        [[dense.kernel_entry(X[i], X[j], reps, 1.0, emap) for j in range(8)] for i in range(8)]
    )
    for routing, chi, tol in (("tracked", 64, 3e-6), ("brick", 64, 3e-6)):
        ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing=routing)
        cfg = SimConfig(chi=chi, truncation_error=1e-16, precision="f32",
                        svd_method="subspace", subspace_iters=1)
        k = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=8, tile=8)
        assert np.abs(np.diag(k) - 1).max() < 1e-6  # diag-normalized exactly
        assert np.abs(k - kd).max() < tol, routing


def test_structural_caps_values():
    """Per-pair cap triples: powers of two, floored at 4, capped at chi,
    and bounding the true per-bond Schmidt rank min(2^l, 2^r) over BOTH
    parities (the pair's middle bond moves by one between parities)."""
    from qml_cutensornet_tpu.ops.vidal import structural_caps

    n, chi = 10, 16
    K = (n + 2) // 2
    caps = structural_caps(n, K, chi)
    assert len(caps) == K
    sb = lambda j: min(chi, 2 ** min(max(j, 0), n - max(min(j, n), 0)) if 0 <= j <= n else 1)
    for k, (cl, cm, cr) in enumerate(caps):
        for c in (cl, cm, cr):
            assert 4 <= c <= chi and (c & (c - 1)) == 0
        for par in (0, 1):
            mid = par + 2 * k
            assert cl >= min(chi, sb(mid - 1))
            assert cm >= min(chi, sb(mid))
            assert cr >= min(chi, sb(mid + 1))
    # Edge pairs are genuinely cheaper: first pair's left/middle bonds sit
    # under cap while the chain middle saturates chi.
    assert caps[0][0] < chi and any(c == (chi, chi, chi) for c in caps)


@pytest.mark.parametrize("n,reps,d", [(8, 2, 3), (10, 2, 4)])
def test_brick_struct_caps_exact_f64(n, reps, d):
    """Structural caps are EXACT: sliced-shape edge-pair dispatches produce
    the same state (vs the dense golden) as the full-chi brick engine —
    entries beyond a bond's structural Schmidt bound are exact zeros, so
    slicing them off changes nothing."""
    rng = np.random.default_rng(7)
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(4, n))
    cfg = SimConfig(
        chi=2 ** (n // 2), truncation_error=1e-16, precision="f64",
        svd_method="subspace", subspace_iters=2, brick_struct_caps=True,
    )
    st = make_chunked_simulator(ansatz.schedule, cfg)(X)
    assert float(np.asarray(st.fidelity).min()) > 1 - 1e-12
    k = np.asarray(tile_overlaps_sq(st.tensors, st.tensors))
    dg = np.sqrt(np.diag(k))
    kn = k / np.outer(dg, dg)
    kd = np.array(
        [[dense.kernel_entry(X[i], X[j], reps, 1.0, emap) for j in range(4)] for i in range(4)]
    )
    assert np.abs(kn - kd).max() < 1e-9


def test_brick_struct_caps_f32_matches_uncapped():
    """f32 at a non-binding chi: caps-on vs caps-off normalized kernels
    agree to f32 rounding scale — the capped path runs the same math at
    sliced shapes, and with no truncation pressure the only divergence is
    per-op rounding. (Under a BINDING chi cap the two variants legitimately
    diverge at the truncation scale, like any engine-variant pair — see
    test_routing_modes in test_mps_vs_dense.py.)"""
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix

    rng = np.random.default_rng(3)
    n, reps, d = 12, 2, 4
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(6, n))
    base = dict(chi=64, truncation_error=1e-16, precision="f32",
                svd_method="subspace", subspace_iters=1)
    k_off = build_kernel_matrix(ansatz, X, cfg=SimConfig(**base), sim_batch=6, tile=6)
    k_on = build_kernel_matrix(
        ansatz, X, cfg=SimConfig(**base, brick_struct_caps=True), sim_batch=6, tile=6
    )
    assert np.abs(k_on - k_off).max() < 3e-6


def test_brick_sharded_matches_single_device():
    """Brick schedules run through the sharded (shard_map + ppermute ring)
    path unchanged: the mesh-constrained brick simulator feeds the same
    ring as the stream engine."""
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix
    from qml_cutensornet_tpu.parallel.gram import build_kernel_matrix_sharded
    from qml_cutensornet_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    n = 8
    emap = entanglement_graph(n, 2)
    ansatz = KernelStateAnsatz(n, 2, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(16, n))
    cfg = SimConfig(chi=16, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    mesh = make_mesh(4)
    k_sh = build_kernel_matrix_sharded(ansatz, X, cfg=cfg, mesh=mesh)
    k_1 = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=16, tile=16)
    np.testing.assert_allclose(k_sh, k_1, atol=5e-5)
