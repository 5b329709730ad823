"""Batched circuit simulation: the whole datapoint batch in ONE XLA program.

The reference simulates circuits one at a time through native library calls
(gpu_backend/kernel_state_ansatz.py:217-226 — one ``simulate()`` per
datapoint; KernelPkg.jl:81-99). On TPU we invert this: ``lax.scan`` over the
static gate schedule, ``vmap`` over the datapoint batch, ``jit`` once. Every
per-gate truncated SVD becomes a batched SVD over the whole batch, which is
what keeps the MXU busy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import GATE_SWAP, GATE_XX, GateSchedule
from qml_cutensornet_tpu.ops import cpx, gates, mps as mps_ops
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops.mps import MPS


def simulate_one(features, schedule: GateSchedule, cfg: SimConfig) -> MPS:
    """Evolve |0..0> through the ansatz for one datapoint ``features [n]``.

    Traceable: all control flow is static (the schedule); all data-dependence
    is through the angle arrays. Intended to be ``vmap``-ed over a batch.
    """
    n = schedule.num_qubits
    rdt = cfg.real_dtype
    x = jnp.asarray(features, dtype=rdt)
    state = mps_ops.zero_state(n, cfg)
    if schedule.hadamard_init:
        state = mps_ops.apply_1q_all(state, gates.hadamard(rdt))

    gamma = schedule.gamma
    swap_mat = gates.swap(rdt)

    for seg in schedule.segments:
        # Rz feature-encoding layer: diagonal phases; site p carries the
        # feature seg.pos_to_feature[p] under tracked routing.
        xs_at_pos = x[seg.pos_to_feature]
        phases = gates.rz_phases(gamma * xs_at_pos, rdt)  # [n, 2]
        state = mps_ops.apply_diag_all(state, phases)

        if len(seg.sites) == 0:
            continue
        # Entangling angles: theta = (pi/2) * gamma^2 * (1-x_a) * (1-x_b).
        thetas = (
            0.5 * jnp.pi * (gamma * gamma) * (1.0 - x[seg.fa]) * (1.0 - x[seg.fb])
        ).astype(rdt)

        eye_mat = Cpx(jnp.eye(4, dtype=rdt), jnp.zeros((4, 4), rdt))

        def body(carry, step):
            site, gkind, direction, theta = step
            xx = gates.xxphase(theta, rdt)
            # One-hot blend over the three static gate kinds (I / SWAP / XX).
            w_sw = (gkind == GATE_SWAP).astype(rdt)
            w_xx = (gkind == GATE_XX).astype(rdt)
            w_i = 1.0 - w_sw - w_xx
            mat = Cpx(
                w_i * eye_mat.re + w_sw * swap_mat.re + w_xx * xx.re,
                w_xx * xx.im,
            )
            return mps_ops.apply_2site(carry, site, mat, cfg, direction), None

        state, _ = lax.scan(
            body,
            state,
            (
                jnp.asarray(seg.sites),
                jnp.asarray(seg.gkinds),
                jnp.asarray(seg.dirs),
                thetas,
            ),
        )
    return state


def make_batched_simulator(schedule: GateSchedule, cfg: SimConfig):
    """Returns a jitted ``features [B, n] -> MPS`` (leaves batched on axis 0)."""

    @jax.jit
    def sim_batch(features):
        with jax.default_matmul_precision(cfg.matmul_precision):
            return jax.vmap(lambda f: simulate_one(f, schedule, cfg))(features)

    return sim_batch


from functools import partial


@partial(jax.jit, static_argnames=("precision",))
def tile_overlaps_sq(ay: Cpx, ax: Cpx, precision: str = "highest"):
    """All-pairs squared overlaps between two batches of MPS site tensors.

    ``ay [By, n, chi, 2, chi]``, ``ax [Bx, n, chi, 2, chi]`` (Cpx pairs)
    -> real ``[By, Bx]`` with entries ``|<y_i|x_j>|^2`` (the reference's
    kernel entry, gpu:380-383 / KernelPkg.jl:106).

    Implemented as a transfer-matrix scan over sites carrying
    ``M [By, Bx, chi, chi]``; each site contributes batched matmuls that map
    straight onto the MXU — this replaces the reference's
    one-``vdot``-call-per-pair hot loop (gpu:366-405).
    """
    By = ay.re.shape[0]
    Bx, chi = ax.re.shape[0], ax.re.shape[2]
    with jax.default_matmul_precision(precision):
        m0re = jnp.zeros((By, Bx, chi, chi), dtype=ax.re.dtype).at[:, :, 0, 0].set(1.0)
        m0 = Cpx(m0re, jnp.zeros_like(m0re))

        def step(m, ts):
            ty_re, ty_im, tx_re, tx_im = ts
            ty, tx = Cpx(ty_re, ty_im), Cpx(tx_re, tx_im)
            t = cpx.einsum("yxab,xbsd->yxasd", m, tx)
            m2 = cpx.einsum("yasc,yxasd->yxcd", cpx.conj(ty), t)
            return m2, None

        site_major = lambda t: jnp.moveaxis(t, 1, 0)
        m, _ = lax.scan(
            step,
            m0,
            (
                site_major(ay.re),
                site_major(ay.im),
                site_major(ax.re),
                site_major(ax.im),
            ),
        )
        ov = cpx.tmap(lambda t: t[:, :, 0, 0], m)
        return cpx.abs2(ov)
