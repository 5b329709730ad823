"""Batched circuit simulation: the whole datapoint batch in ONE XLA program.

The reference simulates circuits one at a time through native library calls
(gpu_backend/kernel_state_ansatz.py:217-226 — one ``simulate()`` per
datapoint; KernelPkg.jl:81-99). On TPU we invert this: ``lax.scan`` over the
static gate schedule, ``vmap`` over the datapoint batch, ``jit`` once. Every
per-gate truncated SVD becomes a batched SVD over the whole batch, which is
what keeps the MXU busy.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import (
    GATE_H1,
    GATE_I,
    GATE_RX,
    GATE_RZ1,
    GATE_SWAP,
    GATE_XX,
    GATE_XXSW,
    GATE_ZZ,
    GateSchedule,
)
from qml_cutensornet_tpu.ops import cpx, gates, mps as mps_ops
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops.mps import MPS


def apply_schedule_op(state: MPS, site, gkind, direction, theta, cfg: SimConfig) -> MPS:
    """Dispatch one lowered op: GATE_I ops are canonical-center moves
    (single-site QR, exact and cheap); SWAP/XX/XXSW/ZZ are two-site
    truncating updates; RX/RZ1/H1 are single-site gates (exact, no SVD,
    center untouched — 1q unitaries preserve site isometries). Traceable
    with all of (site, gkind, direction, theta) dynamic. The predicates are
    batch-uniform (op streams are shared across the vmap batch), so the
    conds stay real branches under vmap — untaken gate kinds cost nothing
    at runtime."""
    rdt = cfg.real_dtype
    site = jnp.asarray(site, jnp.int32)
    gkind = jnp.asarray(gkind, jnp.int32)
    direction = jnp.asarray(direction, jnp.int32)

    def do_move(st):
        return mps_ops.move_center(st, site, direction, cfg)

    def do_1q(st):
        # One-hot blend over the single-site kinds (gate-set parity with
        # cpu_backend/kernel_state_ansatz.py:113-131).
        w_rx = (gkind == GATE_RX).astype(rdt)
        w_rz = (gkind == GATE_RZ1).astype(rdt)
        w_h = 1.0 - w_rx - w_rz
        rx = gates.rx(theta, rdt)
        rz = gates.rz(theta, rdt)
        h = gates.hadamard(rdt)
        mat = Cpx(
            w_rx * rx.re + w_rz * rz.re + w_h * h.re,
            w_rx * rx.im + w_rz * rz.im,
        )
        return mps_ops.apply_1q(st, site, mat)

    def do_2site(st):
        xx = gates.xxphase(theta, rdt)
        sw = gates.swap(rdt)
        zz = gates.zzphase(theta, rdt)
        # One-hot blend over the two-site gate kinds. The fused XXSW matrix
        # is xx @ swap, i.e. the XX matrix with columns 1,2 exchanged —
        # built here by permuting xx's columns instead of a 4x4 matmul.
        w_xx = (gkind == GATE_XX).astype(rdt)
        w_fu = (gkind == GATE_XXSW).astype(rdt)
        w_zz = (gkind == GATE_ZZ).astype(rdt)
        w_sw = 1.0 - w_xx - w_fu - w_zz
        perm = jnp.array([0, 2, 1, 3])
        fu = cpx.tmap(lambda t: t[:, perm], xx)
        mat = Cpx(
            w_xx * xx.re + w_fu * fu.re + w_zz * zz.re + w_sw * sw.re,
            w_xx * xx.im + w_fu * fu.im + w_zz * zz.im,
        )
        return mps_ops.apply_2site(st, site, mat, cfg, direction)

    def do_gate(st):
        return lax.cond(gkind >= GATE_RX, do_1q, do_2site, st)

    return lax.cond(gkind == GATE_I, do_move, do_gate, state)


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

        def body(carry, step):
            site, gkind, direction, theta = step
            return apply_schedule_op(carry, site, gkind, direction, theta, cfg), None

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
    """Returns a jitted ``features [B, n] -> MPS`` (leaves batched on axis 0).

    Single-program variant: the whole circuit compiles into one XLA program.
    Preferred for sharded execution (parallel/gram.py) and small schedules;
    for long schedules on a real chip use :func:`make_chunked_simulator`,
    which bounds per-dispatch duration and reuses one compiled chunk body.
    """

    @jax.jit
    def sim_batch(features):
        with jax.default_matmul_precision(cfg.matmul_precision):
            return jax.vmap(lambda f: simulate_one(f, schedule, cfg))(features)

    return sim_batch


def _op_stream_scan(state: MPS, sites, gkinds, dirs, thetas, cfg: SimConfig):
    """Scan a (possibly padded) op stream over one state. ``sites/gkinds/
    dirs [L]`` are shared across the batch; ``thetas [L]`` are per-sample."""

    def body(carry, step):
        site, gkind, direction, theta = step
        return apply_schedule_op(carry, site, gkind, direction, theta, cfg), None

    state, _ = lax.scan(body, state, (sites, gkinds, dirs, thetas))
    return state


_site_mesh_cache: dict = {}


def make_chunked_simulator(
    schedule, cfg: SimConfig, chunk_len: int | None = None, mesh=None
):
    # QMLTPU_CHUNK_LEN: ops per host dispatch on the tracked path. Bigger
    # chunks mean fewer tunnel round-trips (the 32q bench stream is 1092
    # ops = 9+ dispatches at 128) but coarser staged-chi granularity (each
    # chunk runs at the max stage chi it touches) and longer single
    # dispatches (tunneled backends kill long-running programs — keep the
    # default conservative; the knob exists for the on-chip A/B).
    if chunk_len is None:
        chunk_len = int(os.environ.get("QMLTPU_CHUNK_LEN", "128"))
    from qml_cutensornet_tpu.models.ansatz import BrickSchedule

    if isinstance(schedule, BrickSchedule):
        # QMLTPU_SHARD_MPS: "all" or an int N — shard each state's SITE
        # axis over that many local devices (tensor parallelism over the
        # chain, parallel/sharded_mps.py) instead of replicating every
        # state per device. Only when no batch mesh was requested: a 2-D
        # dp x sp mesh is not wired up.
        sp = os.environ.get("QMLTPU_SHARD_MPS", "0")
        if sp != "0" and mesh is None:
            from qml_cutensornet_tpu.parallel.mesh import make_mesh
            from qml_cutensornet_tpu.parallel.sharded_mps import (
                make_sharded_brick_simulator,
            )

            ndev = None if sp == "all" else int(sp)
            if ndev not in _site_mesh_cache:
                _site_mesh_cache[ndev] = make_mesh(ndev, axis="sp")
            return make_sharded_brick_simulator(
                schedule, cfg, _site_mesh_cache[ndev]
            )
        return make_brick_simulator(schedule, cfg, mesh=mesh)
    return _make_chunked_stream_simulator(schedule, cfg, chunk_len, mesh)


def stream_chunk_plan(schedule: GateSchedule, cfg: SimConfig, chunk_len: int, staged: bool):
    """Lower a tracked-routing schedule to padded chunk arrays plus the
    staged-chi execution plan. Shared by the chunked stream simulator and
    the analytic FLOP model (utils/flops.py), so the model counts exactly
    the shapes the engine dispatches.

    Returns ``(segs, chunk_chis, final_chi)``:

    - ``segs``: per segment, ``(pos_to_feature, sites, gkinds, dirs, fa,
      fb, n_chunks)`` with the op arrays padded to a multiple of
      ``chunk_len`` by neutral ops (identity center-move at the
      segment-final center — exact no-ops for the state, but real
      dispatched work).
    - ``chunk_chis``: per segment, the stage chi of each chunk. Staged chi
      uses structural bond-dimension upper bounds: a two-site update across
      bond s can at most double it, bounded by the position-cut dimension
      min(2^(s+1), 2^(n-s-1)) and the cap. Bounds are monotone along the
      stream, so running each chunk at the smallest power-of-two chi that
      holds its end-of-chunk bound is EXACTLY equivalent to running
      everything at cfg.chi (no truncation can occur below the structural
      bound), while the early ramp-up — and the whole program, for
      low-entanglement schedules — runs at much smaller shapes.
    - ``final_chi``: the working chi after the last chunk.
    """
    n = schedule.num_qubits

    segs = []
    for seg in schedule.segments:
        g = len(seg.sites)
        n_chunks = max(1, -(-g // chunk_len)) if g else 0
        pad = n_chunks * chunk_len - g
        if g:
            # Neutral padding op: identity at the segment-final center.
            last_site = int(seg.sites[-1])
            last_dir = int(seg.dirs[-1])
            neutral_site = last_site  # center is at last_site (+1 if DIR_R)
            neutral_dir = last_dir
            sites = np.concatenate([seg.sites, np.full(pad, neutral_site, np.int32)])
            gk = np.concatenate([seg.gkinds, np.full(pad, GATE_I, np.int32)])
            dirs = np.concatenate([seg.dirs, np.full(pad, neutral_dir, np.int32)])
            fa = np.concatenate([seg.fa, np.zeros(pad, np.int32)])
            fb = np.concatenate([seg.fb, np.zeros(pad, np.int32)])
        else:
            sites = gk = dirs = fa = fb = np.zeros((0,), np.int32)
        segs.append((seg.pos_to_feature, sites, gk, dirs, fa, fb, n_chunks))

    chunk_chis: list[list[int]] = []
    if staged:
        floor_chi = min(8, cfg.chi)
        bd = np.ones(max(n - 1, 1), dtype=np.float64)
        cut = np.array(
            [min(2.0 ** (k + 1), 2.0 ** (n - k - 1)) for k in range(max(n - 1, 1))]
        )
        for (_, sites, gk, _, _, _, n_chunks) in segs:
            stages = []
            for c in range(n_chunks):
                for i in range(c * chunk_len, (c + 1) * chunk_len):
                    if gk[i] == GATE_I:
                        continue
                    s = int(sites[i])
                    lb = bd[s - 1] if s > 0 else 1.0
                    rb = bd[s + 1] if s + 1 <= n - 2 else 1.0
                    bd[s] = min(2 * lb, 2 * rb, cut[s], float(cfg.chi))
                bound = int(bd.max())
                stage = floor_chi
                while stage < bound:
                    stage *= 2
                stages.append(min(stage, cfg.chi))
            chunk_chis.append(stages)
    else:
        chunk_chis = [[cfg.chi] * nc for (_, _, _, _, _, _, nc) in segs]
    final_chi = cfg.chi
    for stages in chunk_chis:
        for s in stages:
            final_chi = s  # last assigned stage is the final working chi
    if not any(len(st) for st in chunk_chis):
        final_chi = min(8, cfg.chi) if staged else cfg.chi
    return segs, chunk_chis, final_chi


def _make_chunked_stream_simulator(
    schedule: GateSchedule, cfg: SimConfig, chunk_len: int = 128, mesh=None
):
    """Chunked batched simulator: ``features [B, n] -> MPS`` via a host loop
    over fixed-length op chunks.

    Why: (a) a single dispatched program stays short (long device programs
    trip RPC watchdogs on tunneled TPU backends and serialize poorly with
    host work); (b) ONE compiled chunk body — with the op arrays passed as
    ARGUMENTS, not baked in as constants — is reused for every chunk of
    every rep, so compile time is O(1) in circuit depth.

    Segments are padded to a multiple of ``chunk_len`` with neutral ops
    (identity gate at the current canonical center, center unmoved), which
    are exact no-ops for the state.

    ``mesh``: optional 1-D ``jax.sharding.Mesh``. When given, the batch
    axis of every array (features, per-sample angles, the evolving MPS) is
    sharded over the mesh and each chunk dispatch is one SPMD program —
    the distributed path (parallel/gram.py) gets the same bounded
    per-dispatch duration as the single-device path. ``B`` must then be a
    multiple of the device count.

    The built simulator is cached on the schedule object keyed by
    ``(cfg, chunk_len, mesh)`` so repeated calls (train Gram, then test
    Gram) reuse the same jitted closures instead of re-tracing.
    """
    staged = os.environ.get("QMLTPU_STAGED", "1") != "0"
    cache = getattr(schedule, "_sim_cache", None)
    if cache is None:
        cache = {}
        schedule._sim_cache = cache
    # The Pallas-QR eligibility knobs are read at TRACE time inside
    # cpx.qr/qr_orth; key the cached closures on them so flipping the env
    # between calls cannot silently reuse closures traced the other way.
    pallas_env = (
        os.environ.get("QMLTPU_PALLAS_QR", "1"),
        os.environ.get("QMLTPU_PALLAS_QR_MIN_M", ""),
        os.environ.get("QMLTPU_BLOCKED_QR", "1"),
        os.environ.get("QMLTPU_QR_BLOCK_BYTES", ""),
        os.environ.get("QMLTPU_FUSED_BLOCK_BYTES", ""),
    )
    cache_key = (cfg, chunk_len, mesh, staged, pallas_env)
    if cache_key in cache:
        return cache[cache_key]
    n = schedule.num_qubits
    rdt = cfg.real_dtype
    gamma = schedule.gamma

    segs, chunk_chis, final_chi = stream_chunk_plan(schedule, cfg, chunk_len, staged)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from qml_cutensornet_tpu.parallel.mesh import AXIS

        batch_sharding = NamedSharding(mesh, P(AXIS))
        row_sharding = NamedSharding(mesh, P(AXIS, None))
        repl_sharding = NamedSharding(mesh, P())
        constrain = lambda st: jax.lax.with_sharding_constraint(st, batch_sharding)
        put_rows = lambda a: jax.device_put(a, row_sharding)
        put_repl = lambda a: jax.device_put(a, repl_sharding)
    else:
        constrain = lambda st: st
        put_rows = jnp.asarray
        put_repl = jnp.asarray

    fns: dict = {}

    def fns_for(chi_s: int):
        """Jitted (init, rz, chunk) closures for one stage chi (built lazily,
        one compile per distinct stage size, reused across chunks/calls)."""
        if chi_s in fns:
            return fns[chi_s]
        cfg_s = dataclasses.replace(cfg, chi=chi_s)

        @jax.jit
        def init_batch(features):
            with jax.default_matmul_precision(cfg.matmul_precision):
                def one(_):
                    st = mps_ops.zero_state(n, cfg_s)
                    if schedule.hadamard_init:
                        st = mps_ops.apply_1q_all(st, gates.hadamard(rdt))
                    return st

                return constrain(jax.vmap(one)(features[:, 0]))

        @jax.jit
        def rz_batch(state, xs_at_pos):
            with jax.default_matmul_precision(cfg.matmul_precision):
                def one(st, xp):
                    return mps_ops.apply_diag_all(st, gates.rz_phases(gamma * xp, rdt))

                return constrain(jax.vmap(one)(state, xs_at_pos))

        @jax.jit
        def chunk_batch(state, sites, gkinds, dirs, thetas):
            with jax.default_matmul_precision(cfg.matmul_precision):
                return constrain(
                    jax.vmap(
                        lambda st, th: _op_stream_scan(st, sites, gkinds, dirs, th, cfg_s)
                    )(state, thetas)
                )

        @jax.jit
        def pad_to(state):
            # Grow the bond padding to THIS stage's chi with exact zeros
            # (the padding invariant keeps contractions unchanged).
            old = state.tensors.re.shape[-1]
            pw = ((0, 0),) * (state.tensors.re.ndim - 3) + (
                (0, chi_s - old), (0, 0), (0, chi_s - old),
            )
            t = cpx.tmap(lambda a: jnp.pad(a, pw), state.tensors)
            return constrain(state._replace(tensors=t))

        fns[chi_s] = (init_batch, rz_batch, chunk_batch, pad_to)
        return fns[chi_s]

    def simulate(features) -> MPS:
        x = np.asarray(features, dtype=np.float64)
        first_chi = next(
            (st[0] for st in chunk_chis if st), final_chi
        )
        cur_chi = first_chi
        state = fns_for(cur_chi)[0](put_rows(x.astype(np.dtype(rdt))))
        for (pos_to_feature, sites, gk, dirs, fa, fb, n_chunks), stages in zip(
            segs, chunk_chis
        ):
            state = fns_for(cur_chi)[1](
                state, put_rows(x[:, pos_to_feature].astype(np.dtype(rdt)))
            )
            if n_chunks == 0:
                continue
            thetas = (0.5 * np.pi * gamma * gamma * (1.0 - x[:, fa]) * (1.0 - x[:, fb]))
            thetas = thetas.astype(np.dtype(rdt))
            for c in range(n_chunks):
                if stages[c] > cur_chi:
                    cur_chi = stages[c]
                    state = fns_for(cur_chi)[3](state)
                sl = slice(c * chunk_len, (c + 1) * chunk_len)
                state = fns_for(cur_chi)[2](
                    state,
                    put_repl(sites[sl]),
                    put_repl(gk[sl]),
                    put_repl(dirs[sl]),
                    put_rows(np.ascontiguousarray(thetas[:, sl])),
                )
        return state

    simulate.final_chi = final_chi
    cache[cache_key] = simulate
    return simulate


def brick_stage_plan(schedule, cfg: SimConfig, staged: bool):
    """Staged chi for the brick engine: host-side replay of per-layer
    structural bond bounds -> ``(rep_stages, final_chi)``.

    A two-site update across real bond s yields dim <= min(2*left_bond,
    2*right_bond, position cut, cap), with PRE-layer neighbor dims (all
    pairs of a brick read untouched opposite-parity bonds). Shared by the
    whole-chain brick simulator below and the site-sharded one
    (parallel/sharded_mps.py) — identical stage sequences keep the two
    paths numerically identical."""
    n = schedule.num_qubits
    rep_stages: list[list[int]] = []
    if staged:
        floor_chi = min(8, cfg.chi)
        bd = np.ones(max(n - 1, 1))
        cut = np.array(
            [min(2.0 ** (k + 1), 2.0 ** (n - k - 1)) for k in range(max(n - 1, 1))]
        )
        for rep in schedule.bricks:
            stages = []
            for li in range(len(rep.parities)):
                par = int(rep.parities[li])
                new_bd = bd.copy()
                for k in np.nonzero(rep.active[li])[0]:
                    s = par + 2 * int(k) - 1  # real left site
                    if not (0 <= s <= n - 2):
                        continue
                    lb = bd[s - 1] if s > 0 else 1.0
                    rb = bd[s + 1] if s + 1 <= n - 2 else 1.0
                    new_bd[s] = min(2 * lb, 2 * rb, cut[s], float(cfg.chi))
                bd = new_bd
                bound = int(bd.max())
                stage = floor_chi
                while stage < bound:
                    stage *= 2
                stages.append(min(stage, cfg.chi))
            rep_stages.append(stages)
    else:
        rep_stages = [[cfg.chi] * len(r.parities) for r in schedule.bricks]
    final_chi = min(8, cfg.chi) if staged else cfg.chi
    for st_list in rep_stages:
        for s in st_list:
            final_chi = s
    return rep_stages, final_chi


def brick_chunk_plan(schedule, rep_stages, layer_chunk: int, pairs: int):
    """Chunk the brick layer stream into runs of consecutive same-stage
    layers within one rep, padded to ``layer_chunk`` with inactive
    all-false layers (exact no-ops under the active select) so ONE
    compiled chunk body per stage chi serves every chunk. Schedule arrays
    are padded to ``pairs`` pair columns (>= schedule.pairs_per_layer; the
    site-sharded engine rounds the pair count up to a device multiple).

    Returns ``(chunks2, chunk_arrays)`` with chunks2 entries
    ``(rep_idx, layer_start, layer_end, stage)`` and chunk_arrays entries
    ``(parities [C], swaps [C] f32, actives [C, pairs] bool)``."""
    K = schedule.pairs_per_layer
    chunks2 = []
    for ri, (rep, stages) in enumerate(zip(schedule.bricks, rep_stages)):
        L = len(rep.parities)
        i = 0
        while i < L:
            j = i + 1
            while j < L and j - i < layer_chunk and stages[j] == stages[i]:
                j += 1
            chunks2.append((ri, i, j, stages[i]))
            i = j

    chunk_arrays = []
    for (ri, i, j, stage) in chunks2:
        rep = schedule.bricks[ri]
        pad = layer_chunk - (j - i)
        act = np.concatenate([rep.active[i:j], np.zeros((pad, K), bool)])
        if pairs > K:
            act = np.pad(act, ((0, 0), (0, pairs - K)))
        chunk_arrays.append(
            (
                np.concatenate([rep.parities[i:j], np.zeros(pad, np.int32)]),
                np.concatenate(
                    [rep.swaps[i:j].astype(np.float32), np.zeros(pad, np.float32)]
                ),
                act,
            )
        )
    return chunks2, chunk_arrays


def drive_brick_schedule(
    x,
    schedule,
    chunks2,
    chunk_arrays,
    layer_chunk: int,
    rdt,
    fns_for,
    *,
    init_arg,
    rz_arg,
    place_pars,
    place_acts,
    place_thetas,
    k_pad: int,
    final_chi: int,
):
    """The ONE host driver both brick engines run: rep-theta precompute,
    per-rep Rz dispatch, staged-chi upgrades, chunk dispatch, finalize.

    The whole-chain engine (make_brick_simulator) and the site-sharded one
    (parallel/sharded_mps.py) differ only in array placement and in the
    site frame their Rz layer addresses — both are injected here as
    callables, so the stage/chunk sequencing that keeps the two paths
    numerically identical lives in exactly one place. ``fns_for(chi)``
    returns the per-stage (init, rz, chunk, pad_to, finalize) closures;
    ``k_pad`` pads the per-layer pair axis (the sharded engine rounds it
    up to a device multiple)."""
    gamma = schedule.gamma
    x = np.asarray(x, dtype=np.float64)
    first_chi = chunks2[0][3] if chunks2 else final_chi
    cur_chi = first_chi
    state = fns_for(cur_chi)[0](init_arg(x))
    rep_thetas = []
    for rep in schedule.bricks:
        th = 0.5 * np.pi * gamma * gamma * (1.0 - x[:, rep.fa]) * (1.0 - x[:, rep.fb])
        th = np.where(rep.fire[None], th, 0.0)
        if k_pad > schedule.pairs_per_layer:
            th = np.pad(th, ((0, 0), (0, 0), (0, k_pad - schedule.pairs_per_layer)))
        rep_thetas.append(th.astype(np.dtype(rdt)))
    done_rz = -1
    for (ri, i, j, stage), (pars, sws, acts) in zip(chunks2, chunk_arrays):
        if ri > done_rz:
            state = fns_for(cur_chi)[1](state, rz_arg(ri, x))
            done_rz = ri
        if stage > cur_chi:
            cur_chi = stage
            state = fns_for(cur_chi)[3](state)
        # thetas [C, B, K] (scan axis leading), padded layers get zeros.
        th = rep_thetas[ri][:, i:j]
        pad = layer_chunk - (j - i)
        th = np.pad(th, ((0, 0), (0, pad), (0, 0))).transpose(1, 0, 2)
        state = fns_for(cur_chi)[2](
            state,
            place_pars(pars),
            place_pars(sws),
            place_acts(acts),
            place_thetas(np.ascontiguousarray(th)),
        )
    return fns_for(cur_chi)[4](state)


def make_brick_simulator(schedule, cfg: SimConfig, layer_chunk: int = 16, mesh=None):
    """Brick-parallel batched simulator: ``features [B, n] -> MPS`` via the
    Vidal/Hastings engine (ops/vidal.py) over a :class:`BrickSchedule`.

    Each dispatched program is a ``lax.scan`` over up to ``layer_chunk``
    brick layers; every layer is ONE ``[B * K]``-batched two-site
    factorization instead of the stream engine's per-op updates — at
    nq=100 d=6 that is 72 sequential steps per circuit instead of 3744
    (models/ansatz.py:_raw_brick). Chunks are padded with inactive layers
    (exact no-ops) so ONE compiled chunk body per stage chi serves the
    whole circuit; staged-chi runs the entanglement ramp-up at
    power-of-two sub-caps exactly as the stream engine does.
    """
    from qml_cutensornet_tpu.ops import vidal

    staged = os.environ.get("QMLTPU_STAGED", "1") != "0"
    cache = getattr(schedule, "_sim_cache", None)
    if cache is None:
        cache = {}
        schedule._sim_cache = cache
    pallas_env = (
        os.environ.get("QMLTPU_PALLAS_QR", "1"),
        os.environ.get("QMLTPU_PALLAS_QR_MIN_M", ""),
        os.environ.get("QMLTPU_BLOCKED_QR", "1"),
        os.environ.get("QMLTPU_QR_BLOCK_BYTES", ""),
        os.environ.get("QMLTPU_FUSED_BLOCK_BYTES", ""),
    )
    cache_key = ("brick", cfg, layer_chunk, mesh, staged, pallas_env)
    if cache_key in cache:
        return cache[cache_key]

    n = schedule.num_qubits
    n_p = schedule.num_sites_padded
    K = schedule.pairs_per_layer
    rdt = cfg.real_dtype
    gamma = schedule.gamma

    rep_stages, final_chi = brick_stage_plan(schedule, cfg, staged)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from qml_cutensornet_tpu.parallel.mesh import AXIS

        batch_sharding = NamedSharding(mesh, P(AXIS))
        row_sharding = NamedSharding(mesh, P(AXIS, None))
        repl_sharding = NamedSharding(mesh, P())
        constrain = lambda st: jax.lax.with_sharding_constraint(st, batch_sharding)
        put_rows = lambda a: jax.device_put(a, row_sharding)
        put_repl = lambda a: jax.device_put(a, repl_sharding)
        put_theta = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, AXIS, None)))
    else:
        constrain = lambda st: st
        put_rows = jnp.asarray
        put_repl = jnp.asarray
        put_theta = jnp.asarray

    fns: dict = {}

    def fns_for(chi_s: int):
        if chi_s in fns:
            return fns[chi_s]
        cfg_s = dataclasses.replace(cfg, chi=chi_s)

        @jax.jit
        def init_batch(features):
            with jax.default_matmul_precision(cfg.matmul_precision):
                st = vidal.zero_state(features.shape[0], n_p, cfg_s)
                if schedule.hadamard_init:
                    st = vidal.apply_1q_real_sites(st, gates.hadamard(rdt), n)
                return constrain(st)

        @jax.jit
        def rz_batch(state, xs_at_pos):
            with jax.default_matmul_precision(cfg.matmul_precision):
                ph = gates.rz_phases(gamma * xs_at_pos, rdt)  # [B, n, 2]
                return constrain(vidal.apply_diag_real_sites(state, ph))

        @jax.jit
        def chunk_batch(state, parities, swaps, actives, thetas):
            with jax.default_matmul_precision(cfg.matmul_precision):
                return constrain(
                    vidal.layer_scan(state, parities, swaps, actives, thetas, cfg_s, n=n)
                )

        @jax.jit
        def pad_to(state):
            old = state.tensors.re.shape[-1]
            grow_t = lambda a: jnp.pad(
                a, ((0, 0), (0, 0), (0, chi_s - old), (0, 0), (0, chi_s - old))
            )
            grow_l = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, chi_s - old)))
            return constrain(
                state._replace(
                    tensors=cpx.tmap(grow_t, state.tensors),
                    lams=grow_l(state.lams),
                )
            )

        @jax.jit
        def finalize(state):
            tensors, fid, bond_dims = vidal.to_mps_tensors(state, n)
            return MPS(tensors=tensors, fidelity=fid, bond_dims=bond_dims)

        fns[chi_s] = (init_batch, rz_batch, chunk_batch, pad_to, finalize)
        return fns[chi_s]

    # --- Chunking (shared with the site-sharded engine). Chunk arrays are
    # passed as ARGUMENTS (not baked as constants) so ONE compiled body per
    # stage chi serves every chunk, exactly like the stream engine.
    chunks2, chunk_arrays = brick_chunk_plan(schedule, rep_stages, layer_chunk, K)

    def simulate(features) -> MPS:
        return drive_brick_schedule(
            features, schedule, chunks2, chunk_arrays, layer_chunk, rdt, fns_for,
            init_arg=lambda x: put_rows(x.astype(np.dtype(rdt))),
            rz_arg=lambda ri, x: put_rows(
                x[:, schedule.bricks[ri].pos_to_feature].astype(np.dtype(rdt))
            ),
            place_pars=put_repl,
            place_acts=put_repl,
            place_thetas=put_theta,
            k_pad=K,
            final_chi=final_chi,
        )

    simulate.final_chi = final_chi
    cache[cache_key] = simulate
    return simulate


from functools import partial

_GATE_LIST_KINDS = {
    "SWAP": GATE_SWAP,
    "XXPhase": GATE_XX,
    "ZZPhase": GATE_ZZ,
    "Rx": GATE_RX,
    "Rz": GATE_RZ1,
    "H": GATE_H1,
}


def lower_gate_list(gate_list, num_qubits: int):
    """Lower a BOUND circuit in the reference CPU backend's tuple format
    ``[(name, qubits, params), ...]`` (cpu_backend/kernel_state_ansatz.py:96-131,
    pytket half-turn exponents) to canonical op-stream arrays
    ``(sites, gkinds, dirs, thetas)`` for :func:`apply_schedule_op`.

    Accepts the full reference gate set H/Rx/Rz/XXPhase/ZZPhase/SWAP and
    raises on anything else (mirroring cpu:129). Two-qubit gates must act on
    adjacent sites — the reference's router guarantees this before the
    engine ever sees a circuit (gpu:68-90). Canonical-center moves are
    inserted exactly as in the ansatz compiler (models/ansatz.py
    ``_canonical_lower``); single-site gates neither need nor move the
    center."""
    from qml_cutensornet_tpu.models.ansatz import DIR_L, DIR_R

    raw = []  # (site, kind, theta, is_two_site)
    for name, qubits, params in gate_list:
        kind = _GATE_LIST_KINDS.get(name)
        if kind is None:
            raise RuntimeError(f"Gate {name} not supported.")
        alpha = float(params[0]) if params else 0.0
        theta = 0.5 * np.pi * alpha  # TKET half-turns -> true angle
        if kind >= GATE_RX:
            (q,) = qubits
            raw.append((int(q), kind, theta, False))
        else:
            q0, q1 = sorted(int(q) for q in qubits)
            if q1 != q0 + 1:
                raise RuntimeError(
                    f"Two-qubit gate {name} on non-adjacent qubits ({q0},{q1});"
                    " route the circuit first."
                )
            raw.append((q0, kind, theta, True))

    # Lookahead: site of the NEXT two-site op, for placement direction.
    nxt2 = [None] * len(raw)
    nxt = None
    for i in range(len(raw) - 1, -1, -1):
        nxt2[i] = nxt
        if raw[i][3]:
            nxt = raw[i][0]

    ops = []  # (site, kind, dir, theta)
    center = None
    for i, (site, kind, theta, is2q) in enumerate(raw):
        if not is2q:
            ops.append((site, kind, DIR_R, theta))
            continue
        if center is None:
            center = site
        while center < site:
            ops.append((center, GATE_I, DIR_R, 0.0))
            center += 1
        while center > site + 1:
            ops.append((center - 1, GATE_I, DIR_L, 0.0))
            center -= 1
        nxt = nxt2[i] if nxt2[i] is not None else site
        d = DIR_L if nxt < site else DIR_R
        ops.append((site, kind, d, theta))
        center = site if d == DIR_L else site + 1

    arr = np.asarray([(s, k, d) for (s, k, d, _) in ops], dtype=np.int32).reshape(-1, 3)
    thetas = np.asarray([t for (_, _, _, t) in ops], dtype=np.float64)
    return arr[:, 0], arr[:, 1], arr[:, 2], thetas


def simulate_gate_list(gate_list, num_qubits: int, cfg: SimConfig) -> MPS:
    """Simulate ONE bound circuit given in the reference's lowered tuple
    format — the JAX-engine counterpart of ``KernelPkg.build_and_sim_circ``
    (KernelPkg/src/KernelPkg.jl:45-72) and of the C++ engine's gate loop
    (native/qk_native.cpp). Supports the full reference gate set including
    Rx and ZZPhase, which the ansatz never emits but the reference backends
    accept (cpu:113-131). Returns the final :class:`MPS`."""
    sites, gkinds, dirs, thetas = lower_gate_list(gate_list, num_qubits)
    rdt = cfg.real_dtype
    state = mps_ops.zero_state(num_qubits, cfg)
    with jax.default_matmul_precision(cfg.matmul_precision):
        state = _op_stream_scan(
            state,
            jnp.asarray(sites),
            jnp.asarray(gkinds),
            jnp.asarray(dirs),
            jnp.asarray(thetas, dtype=rdt),
            cfg,
        )
    return state


@partial(jax.jit, static_argnames=("precision",))
def state_norms_sq(a: Cpx, precision: str = "highest"):
    """Per-state squared norms ``<psi_b|psi_b>`` for a batch of MPS site
    tensors ``a [B, n, chi, 2, chi]`` -> real ``[B]``.

    Used to normalize kernel entries: the engines (ours and the
    reference's) do not renormalize after truncation, so |<y|x>|^2 carries
    the product of both states' norm deficits. Dividing it out removes both
    the truncation-fidelity bias and the f32 norm-drift accumulated over
    the gate sequence — the exact kernel has unit diagonal by construction.
    """
    with jax.default_matmul_precision(precision):
        def one(re, im):
            chi = re.shape[1]
            m = Cpx(
                jnp.zeros((chi, chi), re.dtype).at[0, 0].set(1.0),
                jnp.zeros((chi, chi), re.dtype),
            )

            # Index scan + dynamic slice (not scanning the arrays as xs):
            # under vmap, array xs get batch-transposed into full site-major
            # HLO-temp copies of the whole batch (same OOM class as
            # tile_overlaps_sq below; 2 x 1.9 GB at chi=512, B=10, n=100).
            def step(m, i):
                t = Cpx(
                    lax.dynamic_index_in_dim(re, i, axis=0, keepdims=False),
                    lax.dynamic_index_in_dim(im, i, axis=0, keepdims=False),
                )
                tm = cpx.einsum("ab,bsd->asd", m, t)
                return cpx.einsum("asc,asd->cd", cpx.conj(t), tm), None

            m, _ = lax.scan(step, m, jnp.arange(re.shape[0]))
            return m.re[0, 0]

        return jax.vmap(one)(a.re, a.im)


def _combine_sites(a: Cpx, k: int):
    """Pre-contract runs of ``k`` adjacent site tensors into physical-dim
    ``2^k`` blocks: ``[B, n, chi, 2, chi] -> ([B, n//k, chi, 2^k, chi],
    tail [B, chi, 2^rem, chi] | None)``.

    Per-STATE work (O(B * n * chi^3 * 2^k), vs the per-PAIR O(By*Bx) scan
    it accelerates) and storage ``2^k / (2k)`` relative to the input, so
    k=2 is storage-neutral and k=4 doubles it. Bond contraction order is
    left-to-right, matching the scan's site order.
    """
    b, n = a.re.shape[:2]
    chi = a.re.shape[2]
    g, rem = n // k, n % k

    def combine(u: Cpx, t: Cpx) -> Cpx:
        # u [..., chi, p, chi] . t [..., chi, 2, chi] over the shared bond.
        out = cpx.einsum("...xpy,...ytz->...xptz", u, t)
        return cpx.tmap(
            lambda v: v.reshape(*v.shape[:-4], chi, v.shape[-3] * 2, chi), out
        )

    main = None
    if g:
        grp = cpx.tmap(
            lambda t: t[:, : g * k].reshape(b, g, k, chi, 2, chi), a
        )
        main = cpx.tmap(lambda t: t[:, :, 0], grp)
        for j in range(1, k):
            main = combine(main, cpx.tmap(lambda t: t[:, :, j], grp))
    tail = None
    if rem:
        tail = cpx.tmap(lambda t: t[:, g * k], a)
        for j in range(1, rem):
            tail = combine(tail, cpx.tmap(lambda t: t[:, g * k + j], a))
    return main, tail


@partial(jax.jit, static_argnames=("precision", "site_block"))
def tile_overlaps_sq(ay: Cpx, ax: Cpx, precision: str = "highest",
                     site_block: int = 1):
    """All-pairs squared overlaps between two batches of MPS site tensors.

    ``ay [By, n, chi, 2, chi]``, ``ax [Bx, n, chi, 2, chi]`` (Cpx pairs)
    -> real ``[By, Bx]`` with entries ``|<y_i|x_j>|^2`` (the reference's
    kernel entry, gpu:380-383 / KernelPkg.jl:106).

    Implemented as a transfer-matrix scan over sites carrying
    ``M [By, Bx, chi, chi]``; each site contributes batched matmuls that map
    straight onto the MXU — this replaces the reference's
    one-``vdot``-call-per-pair hot loop (gpu:366-405).

    ``site_block=k`` contracts ``k`` sites per scan step from
    pre-combined ``[chi, 2^k, chi]`` blocks (:func:`_combine_sites`):
    ``n/k`` carry round-trips with larger matmul operands — the lever for
    the scan's latency/bandwidth bound (cfg.tile_block /
    QMLTPU_TILE_BLOCK). Scan FLOPs scale as ``2^k/(2k)`` vs per-site:
    k=2 is FLOP-neutral, k=4 doubles them for 4x fewer steps.
    """
    By = ay.re.shape[0]
    Bx, chi = ax.re.shape[0], ax.re.shape[2]
    if ay.re.shape[2] != chi:
        # Staged-chi simulators may return different paddings for different
        # schedules; grow the smaller side with exact zeros (no-op padding).
        chi = max(chi, ay.re.shape[2])
        grow = lambda t: jnp.pad(
            t, ((0, 0), (0, 0), (0, chi - t.shape[2]), (0, 0), (0, chi - t.shape[4]))
        )
        ay = cpx.tmap(grow, ay)
        ax = cpx.tmap(grow, ax)
    with jax.default_matmul_precision(precision):
        m0re = jnp.zeros((By, Bx, chi, chi), dtype=ax.re.dtype).at[:, :, 0, 0].set(1.0)
        m0 = Cpx(m0re, jnp.zeros_like(m0re))

        def step(m, ty: Cpx, tx: Cpx, p: int):
            # Two LARGE batched matmuls per site block of physical dim p
            # (MXU-shaped), not By*Bx tiny ones:
            #   T[x, (y a), (s d)] = sum_b M[x, (y a), b] Tx[x, b, (s d)]
            mx = cpx.tmap(
                lambda t: jnp.moveaxis(t, 1, 0).reshape(Bx, By * chi, chi), m
            )
            txm = cpx.tmap(lambda t: t.reshape(Bx, chi, p * chi), tx)
            t1 = cpx.einsum("xmb,xbn->xmn", mx, txm)  # [Bx, By*chi, p*chi]
            #   M'[y, c, (x d)] = sum_(a s) conj(Ty)[y, (a s), c] T2[y, (a s), (x d)]
            # t1 indices: [x, (y a), (s d)] -> regroup to [y, (a s), (x d)].
            t2 = cpx.tmap(
                lambda t: t.reshape(Bx, By, chi, p, chi)
                .transpose(1, 2, 3, 0, 4)
                .reshape(By, chi * p, Bx * chi),
                t1,
            )
            tym = cpx.tmap(lambda t: t.reshape(By, chi * p, chi), ty)
            m2 = cpx.einsum("ykc,ykn->ycn", cpx.conj(tym), t2)  # [By, chi, Bx*chi]
            return cpx.tmap(
                lambda t: jnp.moveaxis(t.reshape(By, chi, Bx, chi), 2, 1), m2
            )

        # Scan over a site-block INDEX and slice each block's tensors on
        # the fly: feeding site-major transposes of the whole batches as
        # scan xs materializes four full relaid-out copies as HLO temps
        # (4 x 1.9 GB at chi=512, B=10, n=100 — OOMs a 16 GB chip on top
        # of the live arguments). Per-step dynamic slices are
        # [B, chi, 2^k, chi]. NOTE the k>1 peak-memory costs: the combined
        # blocks from _combine_sites are full-size copies that coexist
        # with the (un-donated) ay/ax inputs (~+100% tile-input HBM at
        # k=2), and the step temps t1/t2 [B, B*chi, 2^k*chi] scale with
        # 2^k — callers' tile auto-sizing must budget for both
        # (bench.py), not just the carry.
        k = site_block
        gy, ty_tail = _combine_sites(ay, k) if k > 1 else (ay, None)
        gx, tx_tail = _combine_sites(ax, k) if k > 1 else (ax, None)

        m = m0
        if gy is not None:
            p = gy.re.shape[3]

            def step_i(m, i):
                ty, tx = (
                    Cpx(
                        lax.dynamic_index_in_dim(t.re, i, axis=1, keepdims=False),
                        lax.dynamic_index_in_dim(t.im, i, axis=1, keepdims=False),
                    )
                    for t in (gy, gx)
                )
                return step(m, ty, tx, p), None

            m, _ = lax.scan(step_i, m, jnp.arange(gy.re.shape[1]))
        if ty_tail is not None:
            m = step(m, ty_tail, tx_tail, ty_tail.re.shape[2])
        ov = cpx.tmap(lambda t: t[:, :, 0, 0], m)
        return cpx.abs2(ov)
