"""QMLTPU_CHUNK_LEN (ops per host dispatch, tracked path) must not change
the simulated state. Chunk boundaries only add neutral padding ops
(identity center-moves) and coarsen staged-chi granularity; both are
exact in f64 and sub-parity rounding in f32 (models/simulate.py,
make_chunked_simulator)."""

import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import (
    make_chunked_simulator,
    tile_overlaps_sq,
)


@pytest.fixture(scope="module")
def setup():
    ansatz = KernelStateAnsatz(8, 2, 1.0, entanglement_graph(8, 2))
    feats = np.random.default_rng(0).uniform(0, 2, size=(5, 8))
    return ansatz, feats


def _k(ansatz, feats, cfg, chunk_len):
    st = make_chunked_simulator(ansatz.schedule, cfg, chunk_len=chunk_len)(feats)
    return np.asarray(tile_overlaps_sq(st.tensors, st.tensors))


def test_chunk_len_exact_f64(setup, monkeypatch):
    monkeypatch.setenv("QMLTPU_STAGED", "0")
    ansatz, feats = setup
    cfg = SimConfig(chi=8, precision="f64")
    ka = _k(ansatz, feats.astype(np.float64), cfg, 128)
    kb = _k(ansatz, feats.astype(np.float64), cfg, 16)
    # Identical ops at identical shapes; only the neutral padding-op count
    # differs, which is exact in f64.
    np.testing.assert_allclose(ka, kb, atol=1e-12)


def test_chunk_len_f32_staged(setup):
    ansatz, feats = setup
    cfg = SimConfig(chi=8, precision="f32")
    f32 = feats.astype(np.float32)
    ka = _k(ansatz, f32, cfg, 128)
    kb = _k(ansatz, f32, cfg, 16)
    kc = _k(ansatz, f32, cfg, 2048)  # whole stream in one chunk
    # Staged-chi granularity and padding-op rounding only: measured 6e-6
    # on unnormalized overlaps at this toy size.
    np.testing.assert_allclose(ka, kb, atol=5e-5)
    np.testing.assert_allclose(ka, kc, atol=5e-5)


def test_env_knob(setup, monkeypatch):
    ansatz, feats = setup
    cfg = SimConfig(chi=8, precision="f32")
    f32 = feats.astype(np.float32)
    monkeypatch.setenv("QMLTPU_CHUNK_LEN", "16")
    k_env = np.asarray(
        tile_overlaps_sq(
            *(lambda st: (st.tensors, st.tensors))(
                make_chunked_simulator(ansatz.schedule, cfg)(f32)
            )
        )
    )
    k_arg = _k(ansatz, f32, cfg, 16)
    np.testing.assert_array_equal(k_env, k_arg)
