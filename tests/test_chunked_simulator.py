"""The chunked batched simulator must produce the same STATES as the
single-program path. Raw tensors are only gauge-equivalent (the padding
identity ops recompute an SVD, which may rotate bases inside degenerate
singular subspaces), so comparison is via physical quantities: pairwise
overlaps against the reference states, norms, and fidelities."""

import jax
import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import build_schedule
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import (
    make_batched_simulator,
    make_chunked_simulator,
    tile_overlaps_sq,
)


@pytest.mark.parametrize("routing", ["tracked", "reference"])
@pytest.mark.parametrize("chunk_len", [1, 7, 64, 1024])
def test_chunked_matches_single_program(routing, chunk_len):
    n, reps, nn, gamma = 6, 2, 2, 0.9
    rng = np.random.default_rng(0)
    sched = build_schedule(n, reps, gamma, entanglement_graph(n, nn), routing=routing)
    cfg = SimConfig(chi=8, precision="f64")
    X = rng.uniform(0, 2, size=(5, n))

    ref = jax.block_until_ready(make_batched_simulator(sched, cfg)(X))
    chk = jax.block_until_ready(make_chunked_simulator(sched, cfg, chunk_len)(X))

    # |<chunked_i|single_i>|^2 == 1 for every sample (same physical state)
    cross = np.asarray(tile_overlaps_sq(chk.tensors, ref.tensors))
    np.testing.assert_allclose(np.diag(cross), 1.0, atol=1e-10)
    # and the Gram built from each agrees entry by entry
    g_ref = np.asarray(tile_overlaps_sq(ref.tensors, ref.tensors))
    g_chk = np.asarray(tile_overlaps_sq(chk.tensors, chk.tensors))
    np.testing.assert_allclose(g_chk, g_ref, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(chk.fidelity), np.asarray(ref.fidelity), atol=1e-10
    )
