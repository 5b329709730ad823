"""Per-tile checkpoint/resume (reference C16, cpu_backend:212-282)."""

import numpy as np
import pytest

import qml_cutensornet_tpu as q
from qml_cutensornet_tpu.config import SimConfig


def test_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(0)
    nq = 5
    emap = q.entanglement_graph(nq, 2)
    ansatz = q.KernelStateAnsatz(nq, 1, 0.8, emap)
    cfg = SimConfig(chi=4, precision="f64")
    X = rng.uniform(0, 2, size=(10, nq))

    kwargs = dict(
        truncation_error=1e-16, cfg=cfg, sim_batch=4, tile=4,
        checkpoint=True, checkpoint_dir=str(tmp_path),
    )
    K_full = q.build_kernel_matrix(ansatz, X, info_file=str(tmp_path / "run"), **kwargs)
    # Checkpoint removed at the end (cpu:325-326)
    assert not list(tmp_path.glob("checkpoint_*.npy"))

    # Simulate an interrupted run: a partial checkpoint containing only the
    # first tile; the resumed build must skip it and still be correct.
    partial = np.zeros_like(K_full)
    partial[:4, :4] = K_full[:4, :4]
    np.save(tmp_path / "checkpoint_run.npy", partial)
    K_resumed = q.build_kernel_matrix(ansatz, X, info_file=str(tmp_path / "run"), **kwargs)
    np.testing.assert_allclose(K_resumed, K_full, atol=1e-12)


def test_choose_chi():
    from qml_cutensornet_tpu.utils.autotune import choose_chi

    rng = np.random.default_rng(1)
    nq = 8
    emap = q.entanglement_graph(nq, 3)
    ansatz = q.KernelStateAnsatz(nq, 2, 1.0, emap)
    X = rng.uniform(0, 2, size=(3, nq))
    cfg = SimConfig(precision="f64")
    chi = choose_chi(ansatz.schedule, X, cfg, chi_start=2, chi_max=16)
    # 8 qubits -> exact chi is 16; gamma=1.0 d3 entangles heavily
    assert chi in (8, 16)
    # and the chosen chi indeed reaches high fidelity
    import dataclasses

    import jax

    from qml_cutensornet_tpu.models.simulate import make_chunked_simulator

    out = jax.block_until_ready(
        make_chunked_simulator(ansatz.schedule, dataclasses.replace(cfg, chi=chi))(X)
    )
    assert float(np.min(np.asarray(out.fidelity))) > 1 - 1e-4
