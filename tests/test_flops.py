"""The analytic FLOP model (utils/flops.py) counts the dispatched shapes.

Pins: (a) the model uses the SAME chunk plan the engine dispatches
(stream_chunk_plan is shared code, but the padding accounting here would
drift silently if op-kind handling diverged); (b) scaling laws — chi^3 in
the two-site term, linear in depth/qubits; (c) roofline arithmetic.
"""

import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import GATE_I, KernelStateAnsatz
from qml_cutensornet_tpu.models.entanglement import entanglement_graph
from qml_cutensornet_tpu.models.simulate import stream_chunk_plan
from qml_cutensornet_tpu.utils import flops


def _ansatz(nq=12, d=4, reps=2):
    return KernelStateAnsatz(
        nq, reps, 1.0, entanglement_graph(nq, d), routing="tracked"
    )


def test_counts_padded_ops_exactly():
    """Model total == sum over the plan's ops of the per-kind formula —
    including the GATE_I padding ops (real dispatched QR work)."""
    ans = _ansatz()
    cfg = SimConfig(chi=16, svd_method="subspace", subspace_iters=1)
    segs, chunk_chis, _ = stream_chunk_plan(ans.schedule, cfg, 128, True)
    n = ans.schedule.num_qubits
    expect = 0
    for (_, sites, gk, _, _, _, n_chunks), stages in zip(segs, chunk_chis):
        first_chi = stages[0] if stages else cfg.chi
        expect += n * 6 * 2 * first_chi * first_chi
        for c in range(n_chunks):
            chi = stages[c]
            for kind in gk[c * 128 : (c + 1) * 128]:
                if kind == GATE_I:
                    expect += flops.center_move_flops(chi)
                else:
                    expect += flops.two_site_flops(chi, 1)
        assert (gk[len(ans.schedule.segments[0].sites):] == GATE_I).any() or n_chunks == 0
    got = flops.sim_flops_per_circuit(ans.schedule, cfg, 128, True)
    assert got == expect


def test_chi_cubed_scaling():
    """At fixed schedule, unstaged sim FLOPs scale ~chi^3 once chi dominates."""
    ans = _ansatz()
    f = {}
    for chi in (64, 128):
        cfg = SimConfig(chi=chi, svd_method="subspace", subspace_iters=1)
        f[chi] = flops.sim_flops_per_circuit(ans.schedule, cfg, 128, staged=False)
    ratio = f[128] / f[64]
    assert 7.0 < ratio < 8.1  # chi^3 = 8x, minus O(chi^2) terms


def test_staged_never_exceeds_unstaged():
    ans = _ansatz(nq=16, d=4)
    cfg = SimConfig(chi=64, svd_method="subspace", subspace_iters=2)
    staged = flops.sim_flops_per_circuit(ans.schedule, cfg, 128, staged=True)
    flat = flops.sim_flops_per_circuit(ans.schedule, cfg, 128, staged=False)
    assert staged < flat  # ramp-up chunks run at smaller stages


def test_gram_breakdown_and_roofline():
    ans = _ansatz()
    cfg = SimConfig(chi=16, svd_method="subspace", subspace_iters=1)
    out = flops.gram_flops(ans.schedule, cfg, n_points=10)
    assert out["n_pairs"] == 55
    assert out["sim_flops"] == 10 * out["sim_flops_per_circuit"]
    assert out["tile_flops"] == flops.tile_flops(55, 12, out["final_chi"])
    r = flops.roofline(32.8e12, 1.0, "v5e", "f32_highest_flops")
    assert r["tflops"] == pytest.approx(32.8, rel=1e-3)
    assert r["peak_fraction"] == pytest.approx(1.0, rel=1e-2)
    assert flops.roofline(1, 0.0)["tflops"] is None


def test_iters2_costs_more_than_iters1():
    ans = _ansatz()
    a = flops.two_site_flops(64, 1)
    b = flops.two_site_flops(64, 2)
    assert b > a > 0


def test_brick_model_counts_padded_layers():
    """Brick model: chunks dispatch layer_chunk layers at the chunk stage;
    caps strictly reduce the count; iters=2 > iters=1."""
    ans = KernelStateAnsatz(
        12, 2, 1.0, entanglement_graph(12, 4), routing="brick"
    )
    cfg1 = SimConfig(chi=16, svd_method="subspace", subspace_iters=1)
    cfg2 = SimConfig(chi=16, svd_method="subspace", subspace_iters=2)
    cfgc = SimConfig(
        chi=16, svd_method="subspace", subspace_iters=1, brick_struct_caps=True
    )
    f1 = flops.brick_sim_flops_per_circuit(ans.schedule, cfg1)
    f2 = flops.brick_sim_flops_per_circuit(ans.schedule, cfg2)
    fc = flops.brick_sim_flops_per_circuit(ans.schedule, cfgc)
    assert f2 > f1 > 0
    assert fc < f1  # structural caps slice edge pairs below chi

    # Hand-count one plain (uncapped) plan.
    from qml_cutensornet_tpu.models.simulate import (
        brick_chunk_plan,
        brick_stage_plan,
    )

    rep_stages, _ = brick_stage_plan(ans.schedule, cfg1, True)
    chunks2, _ = brick_chunk_plan(ans.schedule, rep_stages, 16, ans.schedule.pairs_per_layer)
    expect = sum(
        16 * ans.schedule.pairs_per_layer * flops.brick_pair_flops(s, s, s, 1)
        for (_, _, _, s) in chunks2
    )
    expect += sum(
        12 * 6 * 2 * (st[0] if st else cfg1.chi) ** 2 for st in rep_stages
    )
    assert f1 == expect


def test_gram_flops_dispatches_on_schedule_type():
    brick = KernelStateAnsatz(
        12, 2, 1.0, entanglement_graph(12, 4), routing="brick"
    )
    cfg = SimConfig(chi=16, svd_method="subspace", subspace_iters=1)
    out = flops.gram_flops(brick.schedule, cfg, n_points=4)
    assert out["sim_flops_per_circuit"] == flops.brick_sim_flops_per_circuit(
        brick.schedule, cfg
    )
    assert out["n_pairs"] == 10


def test_hbm_bytes_and_floors():
    b = flops.two_site_hbm_bytes(64, 1)
    assert b["xla"] > b["floor"] > 0
    # floor = 4 site tensors of [chi, 2, chi] f32 (re, im) pairs
    assert b["floor"] == 4 * 64 * 2 * 64 * 2 * 4
    t = flops.phase_time_floors(flops.two_site_flops(64, 1), b["xla"])
    assert t["compute_s"] > 0 and t["hbm_s"] > 0
    # chi=512 iters=2 is compute-bound: compute floor >> HBM floor
    b2 = flops.two_site_hbm_bytes(512, 2)
    t2 = flops.phase_time_floors(flops.two_site_flops(512, 2), b2["xla"])
    assert t2["compute_s"] > 4 * t2["hbm_s"]
