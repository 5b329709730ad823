"""Site-sharded single-MPS evolution (parallel/sharded_mps.py).

The reference keeps every MPS whole on one GPU (SURVEY §5 "long-context":
sharding one state across devices is the optional TPU upgrade). These
tests pin the halo-exchange brick engine to the whole-chain brick engine:
both paths share stage plans, chunk plans and the per-pair factorization
kernel (ops/vidal.update_pairs), so agreement should be at reduction-order
noise, not truncation scale."""

import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import (
    make_chunked_simulator,
    state_norms_sq,
    tile_overlaps_sq,
)
from qml_cutensornet_tpu.parallel.mesh import make_mesh
from qml_cutensornet_tpu.parallel.sharded_mps import (
    make_sharded_brick_simulator,
    padded_sites_for,
)


def _kernel_from(st):
    k = np.asarray(tile_overlaps_sq(st.tensors, st.tensors))
    dg = np.sqrt(np.diag(k))
    return k / np.outer(dg, dg)


@pytest.mark.parametrize(
    "n,reps,d,ndev,chi",
    [
        (10, 2, 2, 8, 16),  # n_loc=2: every pair straddles or touches a halo
        (12, 2, 4, 4, 32),
        (9, 2, 3, 2, 16),
        (10, 2, 6, 1, 32),  # degenerate mesh: wrap ring of one device
    ],
)
def test_sharded_matches_whole_chain(n, reps, d, ndev, chi):
    """Final tensors/lams/fidelity/bond_dims of the site-sharded engine
    match the whole-chain brick engine (same stages, same pair kernel)."""
    rng = np.random.default_rng(7)
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(3, n))
    cfg = SimConfig(
        chi=chi, truncation_error=1e-16, precision="f32",
        svd_method="subspace", subspace_iters=1,
    )
    st1 = make_chunked_simulator(ansatz.schedule, cfg)(X)
    mesh = make_mesh(ndev, axis="sp")
    st2 = make_sharded_brick_simulator(ansatz.schedule, cfg, mesh)(X)

    assert st1.tensors.re.shape == st2.tensors.re.shape
    np.testing.assert_array_equal(
        np.asarray(st1.bond_dims), np.asarray(st2.bond_dims)
    )
    np.testing.assert_allclose(
        np.asarray(st1.fidelity), np.asarray(st2.fidelity), rtol=1e-6
    )
    for leaf1, leaf2 in ((st1.tensors.re, st2.tensors.re), (st1.tensors.im, st2.tensors.im)):
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(leaf2), atol=2e-6, rtol=0
        )


def test_sharded_fused_gate_matches_whole_chain():
    """The phase-2b fused brick pair update (cfg.fused_gate, interpret
    mode) must compose with the site-sharded engine's shard_map: the pair
    kernel runs per-shard on the local block + halo. Pinned against the
    PLAIN whole-chain engine (different summation order, shared algorithm)."""
    rng = np.random.default_rng(17)
    n, reps, d, ndev, chi = 10, 2, 2, 4, 16
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(3, n))
    plain = SimConfig(
        chi=chi, truncation_error=1e-16, precision="f32",
        svd_method="subspace", subspace_iters=1,
    )
    fused = SimConfig(
        chi=chi, truncation_error=1e-16, precision="f32",
        svd_method="subspace", subspace_iters=1,
        fused_split=True, fused_gate=True, fused_interpret=True,
    )
    st1 = make_chunked_simulator(ansatz.schedule, plain)(X)
    mesh = make_mesh(ndev, axis="sp")
    st2 = make_sharded_brick_simulator(ansatz.schedule, fused, mesh)(X)
    np.testing.assert_array_equal(
        np.asarray(st1.bond_dims), np.asarray(st2.bond_dims)
    )
    np.testing.assert_allclose(
        np.asarray(st1.fidelity), np.asarray(st2.fidelity), rtol=1e-5
    )
    # Raw tensors differ by basis rotations inside near-degenerate Schmidt
    # clusters (gauge); the kernel is the gauge-invariant observable.
    np.testing.assert_allclose(_kernel_from(st1), _kernel_from(st2), atol=3e-5)


def test_sharded_f64_exact_vs_whole_chain():
    """At f64 the two engines agree to near machine precision, and the
    normalized kernel from the sharded states matches the whole-chain one."""
    rng = np.random.default_rng(3)
    n, reps, d = 8, 2, 3
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(4, n))
    cfg = SimConfig(
        chi=2 ** (n // 2), truncation_error=1e-16, precision="f64",
        svd_method="subspace", subspace_iters=2,
    )
    st1 = make_chunked_simulator(ansatz.schedule, cfg)(X)
    st2 = make_sharded_brick_simulator(ansatz.schedule, cfg, make_mesh(4, axis="sp"))(X)
    np.testing.assert_allclose(
        np.asarray(st1.tensors.re), np.asarray(st2.tensors.re), atol=1e-12, rtol=0
    )
    k1, k2 = _kernel_from(st1), _kernel_from(st2)
    np.testing.assert_allclose(k1, k2, atol=1e-12, rtol=0)
    # Gathered states behave like ordinary MPS downstream.
    norms = np.asarray(state_norms_sq(st2.tensors))
    assert np.all(norms > 0.99)


@pytest.mark.parametrize("dp,sp", [(4, 2), (2, 4)])
def test_sharded_2d_mesh_matches_whole_chain(dp, sp):
    """2-D (dp, sp) mesh: batch sharding and site sharding composed."""
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(13)
    n, reps, d = 10, 2, 3
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(8, n))  # divisible by dp
    cfg = SimConfig(chi=16, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    st1 = make_chunked_simulator(ansatz.schedule, cfg)(X)
    mesh = Mesh(np.array(jax.devices()[: dp * sp]).reshape(dp, sp), ("dp", "sp"))
    st2 = make_sharded_brick_simulator(ansatz.schedule, cfg, mesh)(X)
    np.testing.assert_array_equal(
        np.asarray(st1.bond_dims), np.asarray(st2.bond_dims)
    )
    np.testing.assert_allclose(
        np.asarray(st1.tensors.re), np.asarray(st2.tensors.re), atol=2e-6, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(st1.fidelity), np.asarray(st2.fidelity), rtol=1e-6
    )


def test_shard_mps_env_knob_through_gram(monkeypatch):
    """QMLTPU_SHARD_MPS routes build_kernel_matrix's simulation through the
    site-sharded engine; the kernel matches the whole-chain brick path."""
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix

    rng = np.random.default_rng(9)
    n = 10
    emap = entanglement_graph(n, 3)
    ansatz = KernelStateAnsatz(n, 2, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(6, n))
    cfg = SimConfig(chi=16, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    k1 = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=6, tile=6)
    monkeypatch.setenv("QMLTPU_SHARD_MPS", "4")
    k2 = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=6, tile=6)
    np.testing.assert_allclose(k1, k2, atol=1e-6)


@pytest.mark.parametrize("ndev,tile", [(8, 4), (3, 5), (1, 4)])
def test_sharded_overlaps_pipeline(ndev, tile):
    """gather=False evolution + the pipelined relay contraction match the
    standard gathered tile engine (incl. ragged batch vs tile size)."""
    from qml_cutensornet_tpu.parallel.sharded_mps import (
        make_sharded_brick_simulator,
        sharded_tile_overlaps_sq,
    )

    rng = np.random.default_rng(21)
    n, reps, d = 10, 2, 3
    emap = entanglement_graph(n, d)
    ansatz = KernelStateAnsatz(n, reps, 1.0, emap, routing="brick")
    X = rng.uniform(0, 2, size=(7, n))  # ragged vs tile
    cfg = SimConfig(chi=16, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    mesh = make_mesh(ndev, axis="sp")
    st_sh = make_sharded_brick_simulator(ansatz.schedule, cfg, mesh, gather=False)(X)
    k_sh = np.asarray(
        sharded_tile_overlaps_sq(st_sh.tensors, st_sh.tensors, mesh, tile=tile)
    )
    st_1 = make_chunked_simulator(ansatz.schedule, cfg)(X)
    k_1 = np.asarray(tile_overlaps_sq(st_1.tensors, st_1.tensors))
    np.testing.assert_allclose(k_sh, k_1, atol=2e-6, rtol=0)
    np.testing.assert_allclose(
        np.asarray(st_sh.fidelity), np.asarray(st_1.fidelity), rtol=1e-6
    )


def test_sharded_gram_end_to_end():
    """sharded_gram (fully sharded evolve + relay + diag normalization)
    matches build_kernel_matrix."""
    import qml_cutensornet_tpu as q
    from qml_cutensornet_tpu.parallel.sharded_mps import sharded_gram

    rng = np.random.default_rng(31)
    n = 9
    ansatz = KernelStateAnsatz(n, 2, 1.0, entanglement_graph(n, 2), routing="brick")
    X = rng.uniform(0, 2, size=(6, n))
    cfg = SimConfig(chi=16, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    k_sh = sharded_gram(ansatz, X, cfg, make_mesh(4, axis="sp"), tile=4)
    k_1 = q.build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=6, tile=6)
    np.testing.assert_allclose(k_sh, k_1, atol=5e-6)
    assert np.abs(np.diag(k_sh) - 1).max() < 1e-6


def test_padded_sites_for():
    assert padded_sites_for(13, 8) == 16
    assert padded_sites_for(13, 4) == 16
    assert padded_sites_for(13, 1) == 14
    assert padded_sites_for(11, 8) == 16
    # Always strictly above odd n_p: the wrap pair must stay inactive.
    for ndev in (1, 2, 4, 8):
        for n_p in (9, 11, 13, 103):
            n_s = padded_sites_for(n_p, ndev)
            assert n_s > n_p and n_s % (2 * ndev) == 0


def test_sharded_overlaps_symmetric_mirror():
    """symmetric=True computes only the upper-triangle tiles and mirrors
    the transpose — identical to the full enumeration."""
    from qml_cutensornet_tpu.parallel.sharded_mps import (
        make_sharded_brick_simulator,
        sharded_tile_overlaps_sq,
    )

    rng = np.random.default_rng(41)
    n = 10
    ansatz = KernelStateAnsatz(n, 2, 1.0, entanglement_graph(n, 3), routing="brick")
    X = rng.uniform(0, 2, size=(7, n))
    cfg = SimConfig(chi=16, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    mesh = make_mesh(4, axis="sp")
    st = make_sharded_brick_simulator(ansatz.schedule, cfg, mesh, gather=False)(X)
    full = np.asarray(
        sharded_tile_overlaps_sq(st.tensors, st.tensors, mesh, tile=3)
    )
    sym = np.asarray(
        sharded_tile_overlaps_sq(
            st.tensors, st.tensors, mesh, tile=3, symmetric=True
        )
    )
    # Mirrored OFF-DIAGONAL blocks are exact transposes (copied, not
    # recomputed); within diagonal tiles K[i,j]/K[j,i] are independently
    # rounded f32 values, so only near-symmetry holds there.
    np.testing.assert_array_equal(sym[3:6, 0:3], sym[0:3, 3:6].T)
    np.testing.assert_allclose(sym, sym.T, atol=1e-6)
    np.testing.assert_allclose(sym, full, atol=2e-6)


def test_relay_auto_tile_memory_bound():
    from qml_cutensornet_tpu.parallel.sharded_mps import relay_auto_tile

    # Large chi forces a small tile; small chi saturates the 128 cap.
    assert relay_auto_tile(2048, 13) <= 8
    assert relay_auto_tile(16, 13) == 128
    t = relay_auto_tile(512, 13)
    per = 8  # (re, im) f32 bytes per complex element
    assert 24 * t * t * 512 * 512 * per <= (2 << 30)
