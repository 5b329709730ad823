"""Memory-evolution tracker (reference ``main_track_mem.py``).

Simulates ONE datapoint circuit (index = argv[10]) and logs the MPS memory
footprint to stderr after every two-site gate, in the format the reference's
``runs/mem_evol/plot.py`` parses: a line containing "MPS size" whose value
follows the '=' sign (float, MiB). The reference got these lines from
cuTensorNet's loglevel=10 debug output (main_track_mem.py:168-172,
runs/mem_evol/run_all.sh:12-15); we emit them directly from the engine by
running the schedule eagerly gate by gate.
"""

from __future__ import annotations

import sys

import numpy as np

from qml_cutensornet_tpu.cli import _pipeline as pipe
from qml_cutensornet_tpu.ops import cpx, gates, mps as mps_ops


def simulate_with_mem_log(schedule, features, cfg, log=None):
    """Eager gate-by-gate evolution, logging the unpadded MPS bytes after
    every op. Slow by design (one dispatch per gate) — this is a diagnostic
    tool, like the reference's loglevel=10 mode."""
    import jax.numpy as jnp

    if log is None:
        log = sys.stderr
    rdt = cfg.real_dtype
    x = np.asarray(features, dtype=np.float64)
    itemsize = 2 * jnp.zeros((), rdt).itemsize
    state = mps_ops.zero_state(schedule.num_qubits, cfg)
    if schedule.hadamard_init:
        state = mps_ops.apply_1q_all(state, gates.hadamard(rdt))

    import jax

    from qml_cutensornet_tpu.models.simulate import apply_schedule_op

    # One compiled step reused for every op (eager per-primitive dispatch is
    # prohibitively slow through tunneled TPU backends); returns the state
    # and the unpadded byte count in a single device round-trip.
    @jax.jit
    def step(st, site, gkind, direction, theta):
        with jax.default_matmul_precision(cfg.matmul_precision):
            st = apply_schedule_op(st, site, gkind, direction, theta, cfg)
            return st, mps_ops.actual_nbytes(st, itemsize)

    gamma = schedule.gamma
    for seg in schedule.segments:
        xs = x[seg.pos_to_feature]
        state = mps_ops.apply_diag_all(state, gates.rz_phases(jnp.asarray(gamma * xs, rdt)))
        for g in range(len(seg.sites)):
            theta = 0.5 * np.pi * gamma * gamma * (1 - x[seg.fa[g]]) * (1 - x[seg.fb[g]])
            state, nbytes = step(
                state,
                jnp.int32(seg.sites[g]),
                jnp.int32(seg.gkinds[g]),
                jnp.int32(seg.dirs[g]),
                jnp.asarray(theta, rdt),
            )
            mib = float(nbytes) / (1024**2)
            print(f"[DEBUG] MPS size (MiB) = {mib}", file=log)
            log.flush()
    return state


def main(argv=None) -> None:
    argv = sys.argv if argv is None else argv
    params = pipe.parse_argv(argv)
    if len(argv) <= 10:
        raise ValueError("main_track_mem requires an extra <circ_index> argument.")
    circ_index = int(argv[10])

    import jax

    pipe.echo_params(params, n_procs=len(jax.devices()))
    x_train, _, _, _ = pipe.prepare(params)
    ansatz = pipe.make_ansatz(params)
    cfg = pipe.sim_config(params)

    state = simulate_with_mem_log(ansatz.schedule, x_train[circ_index], cfg)
    print(f"Final fidelity: {float(state.fidelity)}")
    print(f"Max bond dimension: {int(mps_ops.max_bond(state))}")


if __name__ == "__main__":
    main()
