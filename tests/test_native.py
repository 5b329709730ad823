"""Native C++ CPU engine (qml_cutensornet_tpu/native): cross-checks against
the dense statevector golden model AND the JAX engine. Three independent
implementations agreeing pins the numerics."""

import numpy as np
import pytest

import qml_cutensornet_tpu as q
from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.ops import dense

native = pytest.importorskip("qml_cutensornet_tpu.native")


@pytest.fixture(scope="module")
def built():
    try:
        lib = native.load()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native build unavailable: {e}")
    assert lib.qk_version() == 1
    return lib


def test_native_tile_matches_dense(built):
    rng = np.random.default_rng(0)
    nq, reps, nn, gamma = 5, 2, 2, 0.9
    emap = q.entanglement_graph(nq, nn)
    ansatz = q.KernelStateAnsatz(nq, reps, gamma, emap)
    X = rng.uniform(0, 2, size=(4, nq))
    Y = rng.uniform(0, 2, size=(3, nq))

    x_circs = [ansatz.circuit_for_data(x) for x in X]
    y_circs = [ansatz.circuit_for_data(y) for y in Y]
    tile, x_chi, y_chi, x_fid, y_fid, _ = native.compute_tile(nq, x_circs, y_circs)
    assert tile.shape == (3, 4)
    assert np.all(x_fid > 1 - 1e-12) and np.all(y_fid > 1 - 1e-12)
    for i in range(3):
        for j in range(4):
            want = dense.kernel_entry(Y[i], X[j], reps, gamma, emap)
            np.testing.assert_allclose(tile[i, j], want, atol=1e-10)


def test_native_symmetric_tile_matches_jax_engine(built):
    rng = np.random.default_rng(3)
    nq, reps, nn, gamma = 6, 1, 3, 1.0
    emap = q.entanglement_graph(nq, nn)
    ansatz = q.KernelStateAnsatz(nq, reps, gamma, emap)
    X = rng.uniform(0, 2, size=(5, nq))

    circs = [ansatz.circuit_for_data(x) for x in X]
    tile, x_chi, _, _, _, _ = native.compute_tile(nq, circs)
    K = q.build_kernel_matrix(
        ansatz, X, truncation_error=1e-16, cfg=SimConfig(chi=8, precision="f64")
    )
    np.testing.assert_allclose(tile, K, atol=1e-9)
    np.testing.assert_allclose(tile, tile.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(tile), 1.0, atol=1e-12)


def test_native_chi_cap_truncates(built):
    rng = np.random.default_rng(4)
    nq, reps, nn, gamma = 8, 2, 3, 1.0
    emap = q.entanglement_graph(nq, nn)
    ansatz = q.KernelStateAnsatz(nq, reps, gamma, emap)
    X = rng.uniform(0, 2, size=(2, nq))
    circs = [ansatz.circuit_for_data(x) for x in X]
    _, chi_free, _, fid_free, _, _ = native.compute_tile(nq, circs, cutoff=1e-16, chi_cap=0)
    _, chi_cap, _, fid_cap, _, _ = native.compute_tile(nq, circs, cutoff=1e-16, chi_cap=4)
    assert chi_free.max() > 4
    assert chi_cap.max() <= 4
    assert np.all(fid_cap < 1.0) and np.all(fid_cap > 0.3)


def test_native_rejects_unknown_gate(built):
    with pytest.raises(ValueError):
        native.pack_circuits([[("CX", [0, 1], [])]])


def test_native_capped_truncation_is_canonical_quality():
    """A binding chi cap must stay near-optimal: the engine orthogonalizes
    to each gate before the truncated SVD (ITensors `apply` semantics,
    KernelPkg.jl:68). Without canonicalization this config measures
    fidelity ~0.9 and kernel error ~1e-1."""
    import numpy as np

    from qml_cutensornet_tpu import native
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph

    rng = np.random.default_rng(7)
    X = rng.uniform(0, 2, size=(4, 10))
    ans = KernelStateAnsatz(10, 2, 1.0, entanglement_graph(10, 3), routing="reference")
    circs = [ans.circuit_for_data(x) for x in X]
    k_gold, *_ = native.compute_tile(10, circs, cutoff=1e-16, chi_cap=64)
    k8, _, _, fid8, _, _ = native.compute_tile(10, circs, cutoff=1e-16, chi_cap=8)
    assert min(fid8) > 0.99995
    assert np.abs(k8 - k_gold).max() < 5e-4
