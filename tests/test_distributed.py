"""Multi-device Gram build on a virtual 8-device CPU mesh: the sharded
ring (shard_map + ppermute) must agree with the single-device engine."""

import numpy as np
import pytest

import qml_cutensornet_tpu as q
from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.parallel.gram import build_kernel_matrix_sharded
from qml_cutensornet_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(0)
    nq, reps, nn, gamma = 5, 2, 2, 0.8
    emap = q.entanglement_graph(nq, nn)
    ansatz = q.KernelStateAnsatz(nq, reps, gamma, emap)
    cfg = SimConfig(chi=4, precision="f64")
    X = rng.uniform(0, 2, size=(19, nq))  # deliberately not divisible by 8
    Y = rng.uniform(0, 2, size=(11, nq))
    K_ref = q.build_kernel_matrix(ansatz, X, truncation_error=1e-16, cfg=cfg)
    K_xy_ref = q.build_kernel_matrix(ansatz, X, Y=Y, truncation_error=1e-16, cfg=cfg)
    return ansatz, cfg, X, Y, K_ref, K_xy_ref


@pytest.mark.parametrize("ndev", [2, 3, 8])
def test_symmetric_sharded_matches_single(setup, ndev):
    ansatz, cfg, X, _, K_ref, _ = setup
    mesh = make_mesh(ndev)
    K = build_kernel_matrix_sharded(ansatz, X, cfg=cfg, mesh=mesh)
    assert K.shape == K_ref.shape
    np.testing.assert_allclose(K, K_ref, atol=1e-10)


@pytest.mark.parametrize("ndev", [2, 5, 8])
def test_rectangular_sharded_matches_single(setup, ndev):
    ansatz, cfg, X, Y, _, K_xy_ref = setup
    mesh = make_mesh(ndev)
    K = build_kernel_matrix_sharded(ansatz, X, Y=Y, cfg=cfg, mesh=mesh)
    assert K.shape == (11, 19)
    np.testing.assert_allclose(K, K_xy_ref, atol=1e-10)


def test_mesh_entry_point_via_build_kernel_matrix(setup):
    ansatz, cfg, X, _, K_ref, _ = setup
    mesh = make_mesh(4)
    K = q.build_kernel_matrix(ansatz, X, truncation_error=1e-16, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(K, K_ref, atol=1e-10)


def test_fused_ring_matches_stepwise(setup, monkeypatch):
    """QMLTPU_RING=fused (one ring program) and the default stepwise loop
    must produce identical kernels."""
    ansatz, cfg, X, Y, K_ref, K_xy_ref = setup
    mesh = make_mesh(4)
    monkeypatch.setenv("QMLTPU_RING", "fused")
    K = build_kernel_matrix_sharded(ansatz, X, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(K, K_ref, atol=1e-10)
    K_xy = build_kernel_matrix_sharded(ansatz, X, Y=Y, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(K_xy, K_xy_ref, atol=1e-10)


def test_ring_checkpoint_resume(setup, tmp_path):
    """A ring build interrupted after iteration 0 must resume from the
    snapshot and complete correctly (distributed analog of the reference
    CPU backend's per-tile checkpoint, cpu:279-282)."""
    ansatz, cfg, X, _, K_ref, _ = setup
    mesh = make_mesh(4)
    info = tmp_path / "ring_ckpt_test"
    ckdir = str(tmp_path / "tmp")

    # Write the snapshot a run would leave after completing iteration 0
    # (run the real step once), then let the full build resume from it.
    import pathlib

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qml_cutensornet_tpu.models.simulate import make_chunked_simulator
    from qml_cutensornet_tpu.parallel import gram as pgram
    from qml_cutensornet_tpu.parallel.mesh import AXIS

    real_step_factory = pgram.make_ring_steps
    x_pad, _ = pgram._pad_rows(np.asarray(X, dtype=np.float64), 4)
    sim = make_chunked_simulator(ansatz.schedule, cfg, mesh=mesh)
    out = sim(x_pad)
    step = real_step_factory(mesh, 4 // 2 + 1, True, cfg.matmul_precision)
    k0 = jax.device_put(
        np.zeros((x_pad.shape[0], x_pad.shape[0]), dtype=np.dtype(cfg.real_dtype)),
        NamedSharding(mesh, P(None, AXIS)),
    )
    ay1, k1 = step(0, out.tensors, out.tensors, k0)
    ck = pathlib.Path(ckdir)
    ck.mkdir(exist_ok=True)
    np.savez(ck / f"checkpoint_ring_{info.name}.npz",
             k=np.asarray(k1), next_iter=1)

    K = build_kernel_matrix_sharded(
        ansatz, X, cfg=cfg, mesh=mesh, info_file=str(info),
        checkpoint=True, checkpoint_dir=ckdir,
    )
    np.testing.assert_allclose(K, K_ref, atol=1e-10)
    assert not (ck / f"checkpoint_ring_{info.name}.npz").is_file()


def test_sharded_ring_with_fused_kernels(setup):
    """The fused Pallas kernels (interpret mode) must compose with the
    shard_map + ppermute ring: kernel launches happen per-shard inside the
    mapped body. Pins the combination BEFORE any default flip of
    QMLTPU_FUSED_SPLIT on TPU. f32 at chi=16 so the split shapes
    ([32, 32], keep=16) are kernel-eligible."""
    ansatz, _, X, _, _, _ = setup
    f32 = SimConfig(chi=16, precision="f32", svd_method="subspace",
                    subspace_iters=1)
    K_ref = q.build_kernel_matrix(ansatz, X[:12], truncation_error=1e-16, cfg=f32)
    fused = SimConfig(chi=16, precision="f32", svd_method="subspace",
                      subspace_iters=1, fused_split=True, fused_interpret=True)
    mesh = make_mesh(4)
    K = build_kernel_matrix_sharded(ansatz, X[:12], cfg=fused, mesh=mesh)
    np.testing.assert_allclose(K, K_ref, atol=3e-5)

    # Phase 2 (gate + theta build in-kernel) under the same ring.
    gate = SimConfig(chi=16, precision="f32", svd_method="subspace",
                     subspace_iters=1, fused_split=True, fused_gate=True,
                     fused_interpret=True)
    K2 = build_kernel_matrix_sharded(ansatz, X[:12], cfg=gate, mesh=mesh)
    np.testing.assert_allclose(K2, K_ref, atol=3e-5)
