"""Pallas Gram-tile kernel vs the XLA scan implementation (interpret mode
on CPU; the compiled path is exercised on real TPU by the benchmark)."""

import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import build_schedule
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import make_batched_simulator, tile_overlaps_sq
from qml_cutensornet_tpu.ops.pallas_tile import tile_overlaps_sq_pallas


def test_pallas_tile_matches_xla():
    n, reps, nn, gamma = 6, 1, 2, 1.0
    rng = np.random.default_rng(0)
    sched = build_schedule(n, reps, gamma, entanglement_graph(n, nn))
    cfg = SimConfig(chi=8, precision="f32")
    X = rng.uniform(0, 2, size=(8, n))
    Y = rng.uniform(0, 2, size=(16, n))
    sx = make_batched_simulator(sched, cfg)(X)
    sy = make_batched_simulator(sched, cfg)(Y)

    want = np.asarray(tile_overlaps_sq(sy.tensors, sx.tensors))
    got = np.asarray(
        tile_overlaps_sq_pallas(sy.tensors, sx.tensors, block_y=8, block_x=8, interpret=True)
    )
    assert got.shape == (16, 8)
    np.testing.assert_allclose(got, want, atol=5e-6)
