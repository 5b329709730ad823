"""Gate-set parity of the generic gate-list simulator: the JAX engine must
accept the FULL reference gate set H/Rx/Rz/XXPhase/ZZPhase/SWAP
(cpu_backend/kernel_state_ansatz.py:113-131, KernelPkg.jl:8-42) — including
Rx and ZZPhase, which the ansatz never emits — and match the dense
statevector golden."""

import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.simulate import simulate_gate_list
from qml_cutensornet_tpu.ops import dense, mps as mps_ops


def _dense_apply(gates, n):
    v = dense.zero_state(n)
    for name, qubits, params in gates:
        alpha = float(params[0]) if params else 0.0
        theta = 0.5 * np.pi * alpha
        u = {
            "H": lambda t: dense.HADAMARD,
            "SWAP": lambda t: dense.SWAP,
            "Rx": dense.rx,
            "Rz": dense.rz,
            "XXPhase": dense.xxphase,
            "ZZPhase": dense.zzphase,
        }[name](theta)
        v = dense.apply_gate(v, u, list(qubits), n)
    return v


def _random_circuit(rng, n, depth):
    gates = []
    for q in range(n):
        gates.append(("H", [q], []))
    for _ in range(depth):
        kind = rng.choice(["Rx", "Rz", "XXPhase", "ZZPhase", "SWAP"])
        if kind in ("Rx", "Rz"):
            gates.append((kind, [int(rng.integers(n))], [float(rng.uniform(-1, 1))]))
        else:
            q0 = int(rng.integers(n - 1))
            params = [] if kind == "SWAP" else [float(rng.uniform(-1, 1))]
            gates.append((kind, [q0, q0 + 1], params))
    return gates


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gate_list_matches_dense(seed):
    rng = np.random.default_rng(seed)
    n = 5
    gates = _random_circuit(rng, n, depth=40)
    cfg = SimConfig(truncation_error=1e-16, chi=2 ** (n // 2), precision="f64")
    st = simulate_gate_list(gates, n, cfg)
    got = mps_ops.to_dense(st, n)
    want = _dense_apply(gates, n)
    # Global phase is physical here (no phase freedom introduced: every
    # factorization keeps Q R = theta exactly), so compare vectors directly.
    assert np.abs(got - want).max() < 1e-10


def test_gate_list_rejects_unknown_and_nonadjacent():
    cfg = SimConfig(truncation_error=1e-16, chi=4, precision="f64")
    with pytest.raises(RuntimeError, match="not supported"):
        simulate_gate_list([("CX", [0, 1], [])], 4, cfg)
    with pytest.raises(RuntimeError, match="non-adjacent"):
        simulate_gate_list([("XXPhase", [0, 2], [0.5])], 4, cfg)


def test_ansatz_circuit_for_data_through_gate_list():
    """The reference-format circuit emitted by KernelStateAnsatz (reference
    routing, cpu:96-131) simulates to the same state as the dense ansatz
    golden — ties the generic path to the production ansatz semantics."""
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph

    rng = np.random.default_rng(7)
    n, reps, gamma = 5, 2, 0.8
    emap = entanglement_graph(n, 2)
    ansatz = KernelStateAnsatz(n, reps, gamma, emap)
    x = rng.uniform(0, 2, size=n)
    gates = ansatz.circuit_for_data(x)
    cfg = SimConfig(truncation_error=1e-16, chi=2 ** (n // 2), precision="f64")
    st = simulate_gate_list(gates, n, cfg)
    got = mps_ops.to_dense(st, n)
    want = dense.ansatz_state(x, reps, gamma, emap)
    assert np.abs(got - want).max() < 1e-10
