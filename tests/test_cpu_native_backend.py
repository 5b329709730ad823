"""backends/cpu_native: the reference CPU backend's static tile scheduler
over the C++ engine (tiling math, symmetric mirroring, checkpoint/resume,
CPU profiling schema — cpu_backend/kernel_state_ansatz.py:134-328)."""

import json

import numpy as np
import pytest

import qml_cutensornet_tpu as q
from qml_cutensornet_tpu.config import SimConfig

pytest.importorskip("qml_cutensornet_tpu.native")
from qml_cutensornet_tpu.backends import cpu_native  # noqa: E402


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    try:
        from qml_cutensornet_tpu import native

        native.load()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(0)
    nq = 6
    emap = q.entanglement_graph(nq, 2)
    ansatz = q.KernelStateAnsatz(nq, 2, 0.8, emap)
    X = rng.uniform(0, 2, size=(10, nq))
    return ansatz, X, tmp_path_factory.mktemp("ckpt")


def test_cpu_native_matches_jax_engine(setup):
    ansatz, X, ckpt = setup
    K_nat = cpu_native.build_kernel_matrix(
        ansatz, X, info_file=str(ckpt / "run"), number_of_tiles=4,
        checkpoint_dir=str(ckpt),
    )
    K_jax = q.build_kernel_matrix(
        ansatz, X, truncation_error=1e-16, cfg=SimConfig(chi=8, precision="f64")
    )
    np.testing.assert_allclose(K_nat, K_jax, atol=1e-9)
    np.testing.assert_allclose(K_nat, K_nat.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(K_nat), 1.0, atol=1e-12)

    # CPU profiling schema (C15, cpu:216-323)
    prof = json.load(open(str(ckpt / "run") + ".json"))
    for key in ["lenX", "lenY", "n_tiles", "truncation_error", "vdots_per_tile",
                "total_time", "median_tile_time", "median_circ_sim",
                "q1_circ_sim", "q3_circ_sim", "median_product", "q1_product",
                "q3_product", "ave max chi x", "ave max chi y"]:
        assert key in prof, key
    # checkpoint removed at the end
    assert not list(ckpt.glob("checkpoint_*.npy"))


def test_cpu_native_rectangular_and_len_check(setup):
    ansatz, X, ckpt = setup
    Y = X[:4]
    K = cpu_native.build_kernel_matrix(
        ansatz, X, Y=Y, info_file=str(ckpt / "rect"), checkpoint_dir=str(ckpt)
    )
    assert K.shape == (4, 10)
    with pytest.raises(ValueError):
        cpu_native.build_kernel_matrix(ansatz, Y, Y=X, checkpoint_dir=str(ckpt))
