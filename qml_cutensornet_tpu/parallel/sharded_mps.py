"""Site-sharded brick evolution: ONE MPS split across the device mesh.

The reference never shards a single state — each MPS lives wholly on one
GPU (SURVEY §5 "long-context"; mem_evol measures ~2 GiB/MPS at nq=100
d=12) and all parallelism is over kernel-matrix tiles. On TPU the analogous
"long-context" axis is qubit count x bond dimension: at large (n, chi) the
EVOLUTION working set (per-layer theta intermediates + factorization
workspaces, several x the state itself) outgrows one chip's HBM long
before the state at rest does. This module shards the brick engine's SITE
axis over a 1-D mesh so evolution memory AND factorization FLOPs scale
with device count — tensor parallelism over the chain, the TPU-native
upgrade the survey marks optional ("a TPU rebuild can optionally shard one
MPS across chips").

Layout (global shapes; all site/bond-indexed axes sharded over ``sp``):

- ``tensors [B, n_s, chi, 2, chi]`` — B-form site tensors. ``n_s`` rounds
  the padded site count up to a multiple of ``2 * ndev`` with extra dummy
  product sites (exact e0 bonds, the same trick BrickRep already uses), so
  every device holds ``n_loc = n_s/ndev`` sites (even) and ``K_loc =
  n_loc/2`` pairs of EVERY parity — a uniform SPMD program.
- ``lams [B, n_s, chi]`` — ``lams[:, i]`` is the Schmidt vector on bond
  ``(i, i+1)`` (one trailing dummy bond vs the whole-chain engine's
  ``n_p - 1``, so the bond axis shards exactly like the site axis).
- ``bond_dims [B, n_s]`` int32, same indexing as ``lams``.
- ``fid [ndev, B]`` — per-shard partial kept-fraction products (axis 0
  sharded); the state's fidelity is their product.

Brick layer with halo exchange (3 neighbor ``ppermute``s on ICI, each
~``B * chi * 2 * chi`` elements — O(MBs) vs the O(GB) theta working set):

1. recv the right neighbor's FIRST site (halo) and the left neighbor's
   LAST lambda: the local pair list for parity p is left-offsets
   ``p + 2j``, j in [0, K_loc); the last parity-1 pair straddles the
   boundary and uses the halo site, and the first parity-0 pair reads the
   halo lambda.
2. run :func:`ops.vidal.update_pairs` on the local pairs (memory-chunked
   like ``brick_layer``) and scatter into the extended block.
3. send the updated halo back right; a device ACCEPTS the returned site as
   its new first site only on parity-1 layers (on parity 0 its first site
   was updated locally and the returned halo is stale).

The ring wrap pair (last device's parity-1 straddler, left site
``n_s - 1``) is always inactive: ``n_p`` is odd (models/ansatz.py pads to
odd), so ``n_s >= n_p + 1`` and the wrap pair index ``n_s/2 - 1`` lies
beyond every real pair. Its halo writeback is therefore an exact identity
for device 0.

Pair-index sharding is trivially aligned: for both parities, device d owns
global pair indices ``[d*K_loc, (d+1)*K_loc)``, so schedule arrays
(``active [L, K]``, per-sample thetas) shard with ``P(..., 'sp')`` after
padding the pair axis to ``K_s = n_s/2`` columns
(models/simulate.brick_chunk_plan).

Overlaps/Gram: a single MPS at rest is small (nq=100 chi=512 f32 ~ 200 MB)
— after evolution the state is gathered and fed to the standard tile
engines (models/simulate.tile_overlaps_sq, parallel/gram.py ring), which
already shard over the TILE axes. Site sharding buys the evolution-time
memory/FLOP scaling; it does not need to own the contraction stage.

Numerics: stage plans, chunk plans and per-pair factorizations are shared
verbatim with the whole-chain brick engine (brick_stage_plan,
brick_chunk_plan, update_pairs), so both paths perform identical per-pair
arithmetic — the parity ledger (docs/PARITY.md) carries over unchanged.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.simulate import MPS, brick_chunk_plan, brick_stage_plan
from qml_cutensornet_tpu.ops import cpx, gates, vidal
from qml_cutensornet_tpu.ops.cpx import Cpx


class ShardedVidalState(NamedTuple):
    """Site-sharded brick-engine state (see module docstring for layout)."""

    tensors: Cpx  # [B, n_s, chi, 2, chi], axis 1 sharded
    lams: jnp.ndarray  # [B, n_s, chi], axis 1 sharded
    fid: jnp.ndarray  # [ndev, B], axis 0 sharded
    bond_dims: jnp.ndarray  # [B, n_s] int32, axis 1 sharded


def padded_sites_for(n_p: int, ndev: int) -> int:
    """Smallest multiple of ``2 * ndev`` >= ``n_p``. ``n_p`` is odd, so the
    result always strictly exceeds it (the wrap pair stays inactive)."""
    step = 2 * ndev
    return ((n_p + step - 1) // step) * step


def _layer_local(sites, lams, bdims, fid, par, sw, act, th, cfg, ndev, axis):
    """One brick layer on this device's site block (runs inside shard_map).

    ``sites [B, n_loc, chi, 2, chi]`` Cpx, ``lams/bdims [B, n_loc, ...]``,
    ``fid [1, B]``, ``par``/``sw`` traced scalars, ``act [K_loc]`` bool,
    ``th [B, K_loc]``."""
    B, n_loc, chi = sites.re.shape[0], sites.re.shape[1], sites.re.shape[2]
    k_total = act.shape[0]
    to_left = [(d, (d - 1) % ndev) for d in range(ndev)]  # src d -> dst d-1
    to_right = [(d, (d + 1) % ndev) for d in range(ndev)]

    # Halo in: right neighbor's first site; left neighbor's last lambda.
    halo_site = cpx.tmap(lambda t: lax.ppermute(t[:, :1], axis, to_left), sites)
    halo_lam = lax.ppermute(lams[:, -1:], axis, to_right)
    ext = Cpx(
        jnp.concatenate([sites.re, halo_site.re], axis=1),
        jnp.concatenate([sites.im, halo_site.im], axis=1),
    )
    lam_ext = jnp.concatenate([halo_lam, lams], axis=1)  # [j] = bond LEFT of site j

    kc = vidal._pair_chunk(k_total, chi, B)
    take = lambda x, i: jnp.take(x, i, axis=1)
    for k0 in range(0, k_total, kc):
        hi = min(k_total, k0 + kc)
        idx = par + 2 * (k0 + jnp.arange(hi - k0, dtype=jnp.int32))  # left offsets
        a = cpx.tmap(lambda x: take(x, idx), ext)
        b = cpx.tmap(lambda x: take(x, idx + 1), ext)
        lam_l = take(lam_ext, idx)
        new_a, new_b, s, kf, rank = vidal.update_pairs(a, b, lam_l, th[:, k0:hi], sw, cfg)

        am = act[k0:hi][None, :]
        sel5 = lambda new, old: jnp.where(am[:, :, None, None, None], new, old)
        new_a = Cpx(sel5(new_a.re, a.re), sel5(new_a.im, a.im))
        new_b = Cpx(sel5(new_b.re, b.re), sel5(new_b.im, b.im))
        ext = Cpx(
            ext.re.at[:, idx].set(new_a.re).at[:, idx + 1].set(new_b.re),
            ext.im.at[:, idx].set(new_a.im).at[:, idx + 1].set(new_b.im),
        )
        # Pair at left-offset o writes local bond o (bond right of site o).
        lams = lams.at[:, idx].set(jnp.where(am[:, :, None], s, take(lams, idx)))
        bdims = bdims.at[:, idx].set(
            jnp.where(am, rank, take(bdims, idx)).astype(jnp.int32)
        )
        fid = fid * jnp.prod(jnp.where(am, kf, 1.0), axis=1)[None, :].astype(fid.dtype)

    # Halo out: return the (possibly updated) halo to the right neighbor.
    # Accept it as our new first site only on parity-1 layers — on parity 0
    # our first site was updated locally and the returned halo is stale.
    back = cpx.tmap(lambda x: lax.ppermute(x[:, n_loc:], axis, to_right), ext)
    accept = par == 1
    first = Cpx(
        jnp.where(accept, back.re, ext.re[:, :1]),
        jnp.where(accept, back.im, ext.im[:, :1]),
    )
    sites = Cpx(
        jnp.concatenate([first.re, ext.re[:, 1:n_loc]], axis=1),
        jnp.concatenate([first.im, ext.im[:, 1:n_loc]], axis=1),
    )
    return sites, lams, bdims, fid


def make_sharded_brick_simulator(
    schedule, cfg: SimConfig, mesh, layer_chunk: int = 16, gather: bool = True
):
    """Site-sharded counterpart of models/simulate.make_brick_simulator:
    ``features [B, n] -> MPS`` with the state's site axis sharded over
    ``mesh`` during evolution; the returned MPS is gathered (replicated)
    for the downstream tile engines. A 1-D mesh shards sites only; a 2-D
    ``(dp, sp)`` mesh additionally batch-shards over its first axis (data
    and tensor parallelism composed). Staged-chi stages and layer chunking
    are identical to the whole-chain brick path.

    ``gather=False`` (1-D mesh only) keeps the returned tensors SITE-
    SHARDED in the padded ``n_s`` frame (dummy sites included; bond_dims
    likewise) for :func:`sharded_tile_overlaps_sq` — the giant-state
    regime where per-device gathering is the thing being avoided."""
    if not gather and len(mesh.axis_names) != 1:
        raise ValueError("gather=False wants a 1-D site mesh.")
    # 1-D mesh: pure site sharding. 2-D mesh (batch_axis, site_axis):
    # batch-parallel over the first axis AND site-sharded over the second —
    # dp x sp composed, e.g. Mesh(devices.reshape(4, 2), ("dp", "sp")).
    if len(mesh.axis_names) == 1:
        bp, axis = None, mesh.axis_names[0]
    elif len(mesh.axis_names) == 2:
        bp, axis = mesh.axis_names
    else:
        raise ValueError("Site sharding wants a 1-D (sp) or 2-D (dp, sp) mesh.")
    ndev = int(mesh.shape[axis])

    staged = os.environ.get("QMLTPU_STAGED", "1") != "0"
    cache = getattr(schedule, "_sim_cache", None)
    if cache is None:
        cache = {}
        schedule._sim_cache = cache
    pallas_env = (
        os.environ.get("QMLTPU_PALLAS_QR", "1"),
        os.environ.get("QMLTPU_PALLAS_QR_MIN_M", ""),
        os.environ.get("QMLTPU_BLOCKED_QR", "1"),
    )
    cache_key = ("sharded_brick", cfg, layer_chunk, mesh, staged, pallas_env, gather)
    if cache_key in cache:
        return cache[cache_key]

    n = schedule.num_qubits
    n_p = schedule.num_sites_padded
    n_s = padded_sites_for(n_p, ndev)
    K_s = n_s // 2
    rdt = cfg.real_dtype
    gamma = schedule.gamma

    rep_stages, final_chi = brick_stage_plan(schedule, cfg, staged)
    chunks2, chunk_arrays = brick_chunk_plan(schedule, rep_stages, layer_chunk, K_s)

    sh_sites = NamedSharding(mesh, P(bp, axis))
    sh_fid = NamedSharding(mesh, P(axis, bp))
    sh_repl = NamedSharding(mesh, P())
    state_specs = ShardedVidalState(
        tensors=Cpx(P(bp, axis), P(bp, axis)),
        lams=P(bp, axis),
        fid=P(axis, bp),
        bond_dims=P(bp, axis),
    )

    fns: dict = {}

    def fns_for(chi_s: int):
        if chi_s in fns:
            return fns[chi_s]
        cfg_s = dataclasses.replace(cfg, chi=chi_s)
        had_mask = jnp.zeros((n_s,), bool).at[1 : n + 1].set(True)

        def init_batch(features):
            B = features.shape[0]
            re = jnp.zeros((B, n_s, chi_s, 2, chi_s), dtype=rdt)
            re = re.at[:, :, 0, 0, 0].set(1.0)
            lams = jnp.zeros((B, n_s, chi_s), dtype=rdt).at[:, :, 0].set(1.0)
            st = ShardedVidalState(
                tensors=Cpx(re, jnp.zeros_like(re)),
                lams=lams,
                fid=jnp.ones((ndev, B), dtype=rdt),
                bond_dims=jnp.ones((B, n_s), dtype=jnp.int32),
            )
            if schedule.hadamard_init:
                u2 = gates.hadamard(rdt)
                t = st.tensors
                mid = cpx.einsum("st,mnatc->mnasc", u2, t)
                m5 = had_mask[None, :, None, None, None]
                st = st._replace(
                    tensors=Cpx(
                        jnp.where(m5, mid.re, t.re), jnp.where(m5, mid.im, t.im)
                    )
                )
            return st

        def rz_batch(state, angles_s):
            # angles_s [B, n_s]: 0 on dummy sites -> identity phases.
            ph = gates.rz_phases(angles_s, rdt)  # [B, n_s, 2]
            ph5 = cpx.tmap(lambda p: p[:, :, None, :, None], ph)
            return state._replace(tensors=cpx.mul(ph5, state.tensors))

        def chunk_shard(tensors, lams, bdims, fid, pars, sws, acts, ths):
            def body(carry, inp):
                sites_c, lams_c, bdims_c, fid_c = carry
                par, sw, act, th = inp
                out = _layer_local(
                    sites_c, lams_c, bdims_c, fid_c, par, sw, act, th, cfg_s,
                    ndev, axis,
                )
                return out, None

            carry, _ = lax.scan(body, (tensors, lams, bdims, fid), (pars, sws, acts, ths))
            return carry

        sharded_chunk = jax.shard_map(
            chunk_shard,
            mesh=mesh,
            in_specs=(
                Cpx(P(bp, axis), P(bp, axis)),
                P(bp, axis),
                P(bp, axis),
                P(axis, bp),
                P(),
                P(),
                P(None, axis),  # acts [C, K_s]
                P(None, bp, axis),  # ths [C, B, K_s]
            ),
            out_specs=(Cpx(P(bp, axis), P(bp, axis)), P(bp, axis), P(bp, axis), P(axis, bp)),
        )

        def chunk_batch(state, pars, sws, acts, ths):
            t, lams, bdims, fid = sharded_chunk(
                state.tensors, state.lams, state.bond_dims, state.fid, pars, sws,
                acts, ths,
            )
            return ShardedVidalState(tensors=t, lams=lams, fid=fid, bond_dims=bdims)

        def pad_to(state):
            old = state.tensors.re.shape[-1]
            grow_t = lambda a: jnp.pad(
                a, ((0, 0), (0, 0), (0, chi_s - old), (0, 0), (0, chi_s - old))
            )
            grow_l = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, chi_s - old)))
            return state._replace(
                tensors=cpx.tmap(grow_t, state.tensors),
                lams=grow_l(state.lams),
            )

        def finalize(state):
            # Gather: replicate the real-site block for the tile engines.
            tensors = cpx.tmap(lambda x: x[:, 1 : n + 1], state.tensors)
            fid = jnp.prod(state.fid, axis=0)
            bond_dims = state.bond_dims[:, 1:n]
            return MPS(tensors=tensors, fidelity=fid, bond_dims=bond_dims)

        def finalize_sharded(state):
            # Keep the padded n_s site frame and the site sharding; real
            # sites live at 1..n, real bonds at 1..n-1 (slicing would
            # re-shard, which gather=False exists to avoid).
            fid = jnp.prod(state.fid, axis=0)
            return MPS(
                tensors=state.tensors, fidelity=fid, bond_dims=state.bond_dims
            )

        constrain = lambda st: jax.lax.with_sharding_constraint(
            st,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                state_specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
        prec = jax.default_matmul_precision

        jfns = (
            jax.jit(lambda f: constrain(init_batch(f))),
            jax.jit(lambda st, a: constrain(rz_batch(st, a))),
            jax.jit(chunk_batch),
            jax.jit(lambda st: constrain(pad_to(st))),
            jax.jit(
                lambda st: jax.lax.with_sharding_constraint(
                    finalize(st),
                    MPS(
                        tensors=Cpx(sh_repl, sh_repl),
                        fidelity=sh_repl,
                        bond_dims=sh_repl,
                    ),
                )
            )
            if gather
            else jax.jit(
                lambda st: jax.lax.with_sharding_constraint(
                    finalize_sharded(st),
                    MPS(
                        tensors=Cpx(sh_sites, sh_sites),
                        fidelity=sh_repl,
                        bond_dims=sh_sites,
                    ),
                )
            ),
        )

        def wrap(fn):
            def run(*args):
                with prec(cfg.matmul_precision):
                    return fn(*args)

            return run

        fns[chi_s] = tuple(wrap(f) for f in jfns)
        return fns[chi_s]

    put_site = lambda a: jax.device_put(a, sh_sites)
    put_fidx = lambda a: jax.device_put(a, sh_fid)
    put_repl = lambda a: jax.device_put(a, sh_repl)
    put_acts = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, axis)))
    put_ths = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, None, axis)))

    def simulate(features) -> MPS:
        x = np.asarray(features, dtype=np.float64)
        B = x.shape[0]
        first_chi = chunks2[0][3] if chunks2 else final_chi
        cur_chi = first_chi
        state = fns_for(cur_chi)[0](put_repl(x.astype(np.dtype(rdt))))
        rep_thetas = []
        for rep in schedule.bricks:
            th = 0.5 * np.pi * gamma * gamma * (1.0 - x[:, rep.fa]) * (1.0 - x[:, rep.fb])
            th = np.where(rep.fire[None], th, 0.0)
            if K_s > schedule.pairs_per_layer:
                th = np.pad(th, ((0, 0), (0, 0), (0, K_s - schedule.pairs_per_layer)))
            rep_thetas.append(th.astype(np.dtype(rdt)))
        done_rz = -1
        for (ri, i, j, stage), (pars, sws, acts) in zip(chunks2, chunk_arrays):
            if ri > done_rz:
                ang = np.zeros((B, n_s), dtype=np.dtype(rdt))
                ang[:, 1 : n + 1] = gamma * x[:, schedule.bricks[ri].pos_to_feature]
                state = fns_for(cur_chi)[1](state, put_site(ang))
                done_rz = ri
            if stage > cur_chi:
                cur_chi = stage
                state = fns_for(cur_chi)[3](state)
            th = rep_thetas[ri][:, i:j]  # [B, c, K_s]
            pad = layer_chunk - (j - i)
            th = np.pad(th, ((0, 0), (0, pad), (0, 0))).transpose(1, 0, 2)
            state = fns_for(cur_chi)[2](
                state,
                put_repl(pars),
                put_repl(sws),
                put_acts(acts),
                put_ths(np.ascontiguousarray(th)),
            )
        return fns_for(cur_chi)[4](state)

    simulate.final_chi = final_chi
    cache[cache_key] = simulate
    return simulate


def sharded_tile_overlaps_sq(
    ay: Cpx, ax: Cpx, mesh, tile: int = 32, precision: str = "highest"
):
    """All-pairs squared overlaps between SITE-SHARDED MPS batches.

    ``ay [By, n_s, chi, 2, chi]`` / ``ax [Bx, n_s, ...]`` are Cpx pairs of
    global arrays sharded ``P(None, sp)`` on the site axis (the
    ``gather=False`` output of :func:`make_sharded_brick_simulator`; dummy
    padding sites are exact ``e0 (x) |0> (x) e0`` products, so they
    contribute identity transfer steps and need no slicing). Returns real
    ``[By, Bx]`` with ``|<y_i|x_j>|^2`` like
    models/simulate.tile_overlaps_sq.

    The transfer-matrix product is inherently sequential over sites, so a
    site-sharded contraction is a device RELAY: the carry
    ``M [tile, tile, chi, chi]`` passes d -> d+1 with each device applying
    its local site block. One tile alone would idle D-1 devices; tiles are
    PIPELINED down the relay instead — at stage s, device d works tile
    ``s - d``, so after a D-stage fill every device is busy and the total
    is ``T + D - 1`` stages for T tiles (vs T * D sequential-equivalents).
    Comm per stage is one neighbor ppermute of M — the same
    compute-dominated shape as the Gram ring (docs/DESIGN.md §4).

    This is the contraction path for states too large to gather per-device
    (chi >~ 2048 at nq >= 100); below that, gather + the standard tile
    engines win on simplicity (module docstring).
    """
    if len(mesh.axis_names) != 1:
        raise ValueError("sharded_tile_overlaps_sq wants a 1-D site mesh.")
    axis = mesh.axis_names[0]
    ndev = int(mesh.devices.size)

    By, chi_y = ay.re.shape[0], ay.re.shape[2]
    Bx, chi_x = ax.re.shape[0], ax.re.shape[2]
    chi = max(chi_y, chi_x)
    grow = lambda t: jnp.pad(
        t, ((0, 0), (0, 0), (0, chi - t.shape[2]), (0, 0), (0, chi - t.shape[4]))
    )
    if chi_y < chi:
        ay = cpx.tmap(grow, ay)
    if chi_x < chi:
        ax = cpx.tmap(grow, ax)

    # Pad batches to tile multiples with exact-zero states (zero overlaps,
    # sliced away below) so every relay stage has one static tile shape.
    byp = -(-By // tile) * tile
    bxp = -(-Bx // tile) * tile
    pad_b = lambda t, target: jnp.pad(
        t, ((0, target - t.shape[0]),) + ((0, 0),) * (t.ndim - 1)
    )
    ay = cpx.tmap(lambda t: pad_b(t, byp), ay)
    ax = cpx.tmap(lambda t: pad_b(t, bxp), ax)
    nyb, nxb = byp // tile, bxp // tile
    n_tiles = nyb * nxb
    to_right = [(d, (d + 1) % ndev) for d in range(ndev)]

    from qml_cutensornet_tpu.parallel.gram import _tile_block

    def relay(ay_re, ay_im, ax_re, ax_im):
        ay_l, ax_l = Cpx(ay_re, ay_im), Cpx(ax_re, ax_im)
        idx = lax.axis_index(axis)
        n_loc = ay_l.re.shape[1]
        one = ay_l.re.reshape(-1)[0] * 0.0 + 1.0
        m0re = jnp.zeros((tile, tile, chi, chi), ay_l.re.dtype).at[
            :, :, 0, 0
        ].set(1.0) * one
        m0 = Cpx(m0re, jnp.zeros_like(m0re))
        m = m0
        bufs = jnp.zeros((n_tiles, tile, tile), ay_l.re.dtype) * one

        for s in range(n_tiles + ndev - 1):
            t = s - idx
            valid = (t >= 0) & (t < n_tiles)
            tt = jnp.clip(t, 0, n_tiles - 1)
            yi, xi = tt // nxb, tt % nxb
            ay_b = cpx.tmap(
                lambda a: lax.dynamic_slice_in_dim(a, yi * tile, tile, axis=0),
                ay_l,
            )
            ax_b = cpx.tmap(
                lambda a: lax.dynamic_slice_in_dim(a, xi * tile, tile, axis=0),
                ax_l,
            )
            # Device 0 sources each tile fresh; others continue the relay.
            is_src = idx == 0
            m_in = Cpx(
                jnp.where(is_src, m0.re, m.re), jnp.where(is_src, m0.im, m.im)
            )

            def site_step(mc, i):
                ty = cpx.tmap(
                    lambda a: lax.dynamic_index_in_dim(a, i, axis=1, keepdims=False),
                    ay_b,
                )
                tx = cpx.tmap(
                    lambda a: lax.dynamic_index_in_dim(a, i, axis=1, keepdims=False),
                    ax_b,
                )
                return _tile_block(mc, ty, tx), None

            m_out, _ = lax.scan(site_step, m_in, jnp.arange(n_loc))
            done = cpx.abs2(cpx.tmap(lambda a: a[:, :, 0, 0], m_out))
            write = valid & (idx == ndev - 1)
            bufs = bufs.at[tt].set(jnp.where(write, done, bufs[tt]))
            m = cpx.tmap(lambda a: lax.ppermute(a, axis, to_right), m_out)

        # Only the last device holds real results; psum replicates them.
        return lax.psum(jnp.where(idx == ndev - 1, bufs, 0.0), axis)

    run = jax.jit(
        jax.shard_map(
            relay,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
            out_specs=P(),
        )
    )
    with jax.default_matmul_precision(precision):
        bufs = run(ay.re, ay.im, ax.re, ax.im)
    out = jnp.concatenate(
        [
            jnp.concatenate([bufs[yi * nxb + xi] for xi in range(nxb)], axis=1)
            for yi in range(nyb)
        ],
        axis=0,
    )
    return out[:By, :Bx]


def sharded_gram(ansatz, X, cfg: SimConfig, mesh, tile: int = 32) -> np.ndarray:
    """Fully site-sharded symmetric Gram build: evolve with the state's
    site axis sharded (gather=False) and contract with the pipelined
    relay — nothing is ever gathered per-device. Normalization follows
    models/gram.build_kernel_matrix's symmetric convention (divide by the
    tile path's OWN diagonal, the round-3 parity mechanism;
    QMLTPU_NORMALIZE=0 restores raw products).

    The convenience entry for the giant-state regime; for everything the
    reference's scales cover, build_kernel_matrix (+ QMLTPU_SHARD_MPS for
    sharded evolution) is the production path.
    """
    schedule = ansatz.schedule
    sim = make_sharded_brick_simulator(schedule, cfg, mesh, gather=False)
    st = sim(np.asarray(X, dtype=np.float64))
    k = np.asarray(
        sharded_tile_overlaps_sq(
            st.tensors, st.tensors, mesh, tile=tile,
            precision=cfg.resolved_tile_precision,
        )
    )
    if os.environ.get("QMLTPU_NORMALIZE", "1") != "0":
        dg = np.sqrt(np.maximum(np.diag(k), 0.0))
        dg = np.where(dg > 0, dg, 1.0)
        k = k / np.outer(dg, dg)
    return k
