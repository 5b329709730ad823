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


def test_staged_chi_matches_unstaged(monkeypatch):
    """Staged-chi execution (small padded chi for the ramp-up chunks, grown
    between stages) is exactly equivalent: structural bond bounds guarantee
    no truncation can occur below the stage cap."""
    n, reps, nn, gamma = 10, 2, 3, 0.9
    rng = np.random.default_rng(3)
    sched = build_schedule(n, reps, gamma, entanglement_graph(n, nn))
    cfg = SimConfig(chi=32, precision="f64")
    X = rng.uniform(0, 2, size=(4, n))

    monkeypatch.setenv("QMLTPU_STAGED", "0")
    ref = jax.block_until_ready(make_chunked_simulator(sched, cfg, 16)(X))
    monkeypatch.setenv("QMLTPU_STAGED", "1")
    stg_sim = make_chunked_simulator(sched, cfg, 16)
    stg = jax.block_until_ready(stg_sim(X))

    # The staged state may be padded below cfg.chi; it must still be the
    # same physical state with the same truncation record.
    assert stg.tensors.re.shape[2] == stg_sim.final_chi <= cfg.chi
    cross = np.asarray(tile_overlaps_sq(stg.tensors, ref.tensors))
    np.testing.assert_allclose(np.diag(cross), 1.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(stg.fidelity), np.asarray(ref.fidelity), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(stg.bond_dims), np.asarray(ref.bond_dims)
    )


def test_staged_chi_low_entanglement_never_grows(monkeypatch):
    """A d=1 schedule (bond bound 4) must run entirely at the floor stage:
    the nq=165 d1 regime's memory/time win (reference avg chi 2.03,
    runs/runtime_scaling/results.csv)."""
    n = 12
    sched = build_schedule(n, 2, 0.5, entanglement_graph(n, 1))
    cfg = SimConfig(chi=64, precision="f64")
    monkeypatch.setenv("QMLTPU_STAGED", "1")
    sim = make_chunked_simulator(sched, cfg, 32)
    assert sim.final_chi == 8  # floor stage holds the structural bound 4
    rng = np.random.default_rng(0)
    out = sim(rng.uniform(0, 2, size=(3, n)))
    assert out.tensors.re.shape[2] == 8
    np.testing.assert_allclose(np.asarray(out.fidelity), 1.0, atol=1e-12)
