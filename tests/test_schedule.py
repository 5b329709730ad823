"""Gate-schedule compiler invariants: entanglement map goldens, canonical
center tracking, routing equivalence."""

import numpy as np
import pytest

from qml_cutensornet_tpu.models.ansatz import (
    DIR_L,
    DIR_R,
    GATE_I,
    GATE_SWAP,
    GATE_XX,
    GATE_XXSW,
    KernelStateAnsatz,
    build_schedule,
)
from qml_cutensornet_tpu.models.entanglement import entanglement_graph


def test_entanglement_graph_golden():
    # hand-derived from main.py:21-45 semantics
    assert entanglement_graph(4, 1) == [(0, 1), (2, 3), (1, 2)]
    assert entanglement_graph(5, 1) == [(0, 1), (2, 3), (1, 2), (3, 4)]
    assert entanglement_graph(4, 2) == [(0, 1), (2, 3), (1, 2), (0, 2), (1, 3)]
    # every distance-d pair present exactly once
    for nq, nn in [(8, 3), (10, 4), (16, 2)]:
        emap = entanglement_graph(nq, nn)
        expected = {(i, i + d) for d in range(1, nn + 1) for i in range(nq - d)}
        assert set(emap) == expected
        assert len(emap) == len(expected)


@pytest.mark.parametrize("routing", ["reference", "tracked"])
@pytest.mark.parametrize("nq,reps,nn", [(6, 2, 3), (9, 3, 4), (5, 1, 1)])
def test_canonical_center_invariant(routing, nq, reps, nn):
    """Replay the lowered op stream and verify every two-site op finds the
    center adjacent to it (the mixed-canonical correctness condition)."""
    sched = build_schedule(nq, reps, 1.0, entanglement_graph(nq, nn), routing=routing)
    center = None
    for seg in sched.segments:
        for s, gk, d in zip(seg.sites, seg.gkinds, seg.dirs):
            s, gk, d = int(s), int(gk), int(d)
            assert 0 <= s <= nq - 2
            if center is not None:
                assert center in (s, s + 1), (
                    f"op at {s} with center {center} (routing={routing})"
                )
            center = s if d == DIR_L else s + 1
    # and the XX gate multiset matches reps * entanglement map (fused
    # XXSW ops carry one XX interaction each)
    n_xx = sum(
        int(np.sum((seg.gkinds == GATE_XX) | (seg.gkinds == GATE_XXSW)))
        for seg in sched.segments
    )
    assert n_xx == reps * len(entanglement_graph(nq, nn))


@pytest.mark.parametrize("nq,reps,nn", [(8, 2, 3), (12, 2, 4)])
def test_tracked_routing_cheaper(nq, reps, nn):
    emap = entanglement_graph(nq, nn)
    ref = build_schedule(nq, reps, 1.0, emap, routing="reference")
    trk = build_schedule(nq, reps, 1.0, emap, routing="tracked")
    assert trk.num_two_site_ops < ref.num_two_site_ops
    # final_pos is a permutation
    assert sorted(trk.final_pos.tolist()) == list(range(nq))
    assert ref.final_pos.tolist() == list(range(nq))


def test_tracked_rz_position_maps_consistent():
    """pos_to_feature at each rep start must match the accumulated
    permutation from the preceding swaps."""
    nq, reps, nn = 7, 3, 3
    sched = build_schedule(nq, reps, 1.0, entanglement_graph(nq, nn), routing="tracked")
    at = np.arange(nq)
    for seg in sched.segments:
        np.testing.assert_array_equal(seg.pos_to_feature, at)
        for s, gk in zip(seg.sites, seg.gkinds):
            if int(gk) in (GATE_SWAP, GATE_XXSW):  # fused op also swaps
                s = int(s)
                at[s], at[s + 1] = at[s + 1], at[s]
    # final: qubit q at position final_pos[q]  <=>  at[p] = q
    inv = np.empty(nq, dtype=int)
    inv[at] = np.arange(nq)
    np.testing.assert_array_equal(sched.final_pos, inv)


def test_circuit_for_data_contract():
    """Reference CPU-backend lowered format (cpu:96-131): names, adjacency,
    half-turn exponents."""
    nq, reps, gamma = 5, 2, 0.7
    emap = entanglement_graph(nq, 2)
    ansatz = KernelStateAnsatz(nq, reps, gamma, emap)
    x = np.linspace(0.1, 1.9, nq)
    gates = ansatz.circuit_for_data(x)
    names = {g[0] for g in gates}
    assert names <= {"H", "Rz", "XXPhase", "SWAP"}
    assert sum(1 for g in gates if g[0] == "H") == nq
    assert sum(1 for g in gates if g[0] == "Rz") == nq * reps
    assert sum(1 for g in gates if g[0] == "XXPhase") == len(emap) * reps
    for name, qubits, params in gates:
        if name in ("XXPhase", "SWAP"):
            assert qubits[1] == qubits[0] + 1  # routed: adjacent only
        if name == "Rz":
            q = qubits[0]
            np.testing.assert_allclose(params[0], (2 / np.pi) * gamma * x[q])
    with pytest.raises(RuntimeError):
        ansatz.circuit_for_data(x[:3])
