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
        os.environ.get("QMLTPU_QR_BLOCK_BYTES", ""),
        os.environ.get("QMLTPU_FUSED_BLOCK_BYTES", ""),
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

        def rz_batch(state, xs_s):
            # xs_s [B, n_s]: feature values at padded sites, 0 on dummies
            # (gamma * 0 -> identity phases). gamma multiplies the ALREADY
            # rdt-cast features INSIDE the program, matching the whole-chain
            # engines bit-for-bit (models/simulate.py rz_batch computes
            # gamma * xs_at_pos the same way; a host-side f64 product
            # rounded once differs by ~1 ulp on about half the inputs).
            ph = gates.rz_phases(gamma * xs_s, rdt)  # [B, n_s, 2]
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
            # Pallas interpret mode under checked shard_map trips a JAX
            # vma-tracking limitation inside the HLO interpreter (its own
            # error message prescribes this workaround); out_specs above
            # are explicit and pinned by tests/test_sharded_mps.py.
            check_vma=False,
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
    put_repl = lambda a: jax.device_put(a, sh_repl)
    put_acts = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, axis)))
    put_ths = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, None, axis)))

    def _rz_arg(ri, x):
        # The Rz layer addresses the padded n_s site frame: feature values
        # at real sites 1..n, zeros on dummies (identity phases).
        xs_s = np.zeros((x.shape[0], n_s), dtype=np.dtype(rdt))
        xs_s[:, 1 : n + 1] = x[:, schedule.bricks[ri].pos_to_feature].astype(
            np.dtype(rdt)
        )
        return put_site(xs_s)

    def simulate(features) -> MPS:
        from qml_cutensornet_tpu.models.simulate import drive_brick_schedule

        return drive_brick_schedule(
            features, schedule, chunks2, chunk_arrays, layer_chunk, rdt, fns_for,
            init_arg=lambda x: put_repl(x.astype(np.dtype(rdt))),
            rz_arg=_rz_arg,
            place_pars=put_repl,
            place_acts=put_acts,
            place_thetas=put_ths,
            k_pad=K_s,
            final_chi=final_chi,
        )

    simulate.final_chi = final_chi
    cache[cache_key] = simulate
    return simulate


def relay_auto_tile(chi: int, n_loc: int, dtype_bytes: int = 4) -> int:
    """Memory-bounded relay tile: the live set of one relay stage is the
    site-step intermediate ``t [tile, tile, chi, 2, chi]`` (16 B/elem as an
    f32 (re, im) pair per 2 spin values -> ``32 tile^2 chi^2`` bytes) plus
    the in/out carries (``16 tile^2 chi^2``) plus the two sliced site
    blocks (``64 tile n_loc chi^2``). Bound both terms by
    ``QMLTPU_RELAY_TILE_BYTES`` (default 2 GiB) — at chi=2048 that yields
    tile ~6, at chi<=512 it saturates the 128 cap. (The resident sharded
    state batches are a separate, caller-owned budget.)"""
    budget = int(os.environ.get("QMLTPU_RELAY_TILE_BYTES", str(2 << 30)))
    per = 2 * dtype_bytes  # (re, im) pair bytes per complex element
    quad = int((budget / (24 * chi * chi * per)) ** 0.5)  # t + carries
    lin = budget // (16 * max(n_loc, 1) * chi * chi * per)  # site blocks
    return max(2, min(128, quad, lin))


_RELAY_STAGE_CACHE: dict = {}


def _relay_stage_fn(mesh, axis, tile: int, chi: int, n_loc: int, dtype_name: str,
                    precision: str):
    """One compiled relay stage (cached per shape set): every device
    advances ITS current tile by its local site block, the last device
    emits the finished tile, carries ppermute one hop right. The host
    drives stages one dispatch at a time — per-dispatch device time stays
    bounded (CLAUDE.md tunneled-backend rule) and the SAME small program
    serves every stage of every call (no per-call or per-n_tiles
    recompiles)."""
    key = (mesh, axis, tile, chi, n_loc, dtype_name, precision)
    if key in _RELAY_STAGE_CACHE:
        return _RELAY_STAGE_CACHE[key]
    ndev = int(mesh.shape[axis])
    to_right = [(d, (d + 1) % ndev) for d in range(ndev)]

    from qml_cutensornet_tpu.parallel.gram import _tile_block

    def stage(m_re, m_im, ay_re, ay_im, ax_re, ax_im, yi, xi):
        # Per-device blocks: m [1, tile, tile, chi, chi]; ay/ax
        # [B*, n_loc, chi, 2, chi]; yi/xi [1] int32 (host-clipped).
        ay_l, ax_l = Cpx(ay_re, ay_im), Cpx(ax_re, ax_im)
        idx = lax.axis_index(axis)
        one = ay_l.re.reshape(-1)[0] * 0.0 + 1.0
        m0re = jnp.zeros((1, tile, tile, chi, chi), ay_l.re.dtype).at[
            :, :, :, 0, 0
        ].set(1.0) * one
        is_src = idx == 0
        m_in = Cpx(
            jnp.where(is_src, m0re, m_re),
            jnp.where(is_src, jnp.zeros_like(m0re), m_im),
        )
        ay_b = cpx.tmap(
            lambda a: lax.dynamic_slice_in_dim(a, yi[0] * tile, tile, axis=0), ay_l
        )
        ax_b = cpx.tmap(
            lambda a: lax.dynamic_slice_in_dim(a, xi[0] * tile, tile, axis=0), ax_l
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

        m_sq = cpx.tmap(lambda a: a[0], m_in)
        m_out, _ = lax.scan(site_step, m_sq, jnp.arange(n_loc))
        done = cpx.abs2(cpx.tmap(lambda a: a[:, :, 0, 0], m_out))
        m_out = cpx.tmap(lambda a: a[None], m_out)
        m_next = cpx.tmap(lambda a: lax.ppermute(a, axis, to_right), m_out)
        return m_next.re, m_next.im, done[None]

    jitted = jax.jit(
        jax.shard_map(
            stage,
            mesh=mesh,
            in_specs=(
                P(axis), P(axis),  # m carry blocks
                P(None, axis), P(None, axis), P(None, axis), P(None, axis),
                P(axis), P(axis),  # per-device tile coordinates
            ),
            out_specs=(P(axis), P(axis), P(axis)),
        )
    )

    def run(*args):
        with jax.default_matmul_precision(precision):
            return jitted(*args)

    _RELAY_STAGE_CACHE[key] = (run, ndev)
    return _RELAY_STAGE_CACHE[key]


def sharded_tile_overlaps_sq(
    ay: Cpx, ax: Cpx, mesh, tile: int | None = 32, precision: str = "highest",
    symmetric: bool = False,
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

    Each stage is ONE bounded dispatch of a cached compiled program
    (:func:`_relay_stage_fn`) — tunneled backends never see a long device
    program, compile cost is O(1) in the Gram size, and a crash loses at
    most one stage of work. ``tile=None`` picks the largest tile whose
    stage working set fits :func:`relay_auto_tile`'s budget (the resident
    state batches themselves are the caller's budget: B site blocks of
    ``32 n_loc chi^2`` bytes per device bound how large (B, chi) can get
    before multi-host meshes are needed).

    ``symmetric=True`` (ay is ax) computes only the ``yi <= xi`` tiles and
    mirrors the transpose — the same ~2x saving as the ring's mirror-tile
    rule (parallel/gram.py).
    """
    if len(mesh.axis_names) != 1:
        raise ValueError("sharded_tile_overlaps_sq wants a 1-D site mesh.")
    axis = mesh.axis_names[0]
    ndev = int(mesh.devices.size)

    By, chi_y = ay.re.shape[0], ay.re.shape[2]
    Bx, chi_x = ax.re.shape[0], ax.re.shape[2]
    chi = max(chi_y, chi_x)
    n_loc = ay.re.shape[1] // ndev
    if tile is None:
        tile = relay_auto_tile(chi, n_loc)
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
    if symmetric and nyb != nxb:
        raise ValueError("symmetric=True wants ay and ax the same batch")
    tiles = [
        (yi, xi)
        for yi in range(nyb)
        for xi in range(nxb)
        if not symmetric or yi <= xi
    ]
    n_tiles = len(tiles)
    yi_of = np.array([t[0] for t in tiles], np.int32)
    xi_of = np.array([t[1] for t in tiles], np.int32)

    run, _ = _relay_stage_fn(
        mesh, axis, tile, chi, n_loc, str(np.dtype(ay.re.dtype)), precision
    )
    sh_m = NamedSharding(mesh, P(axis))
    m_re = jax.device_put(
        np.zeros((ndev, tile, tile, chi, chi), ay.re.dtype), sh_m
    )
    m_im = jax.device_put(np.zeros_like(np.asarray(m_re)), sh_m)
    out = np.zeros((byp, bxp), np.dtype(ay.re.dtype))
    for s in range(n_tiles + ndev - 1):
        t_of_dev = np.clip(s - np.arange(ndev), 0, n_tiles - 1)
        yi_s = jax.device_put(yi_of[t_of_dev], sh_m)
        xi_s = jax.device_put(xi_of[t_of_dev], sh_m)
        m_re, m_im, done = run(m_re, m_im, ay.re, ay.im, ax.re, ax.im, yi_s, xi_s)
        t_last = s - (ndev - 1)
        if 0 <= t_last < n_tiles:
            yi, xi = tiles[t_last]
            blk = np.asarray(done[ndev - 1])
            out[yi * tile : (yi + 1) * tile, xi * tile : (xi + 1) * tile] = blk
            if symmetric and yi != xi:
                out[xi * tile : (xi + 1) * tile, yi * tile : (yi + 1) * tile] = blk.T
    return out[:By, :Bx]


def sharded_gram(
    ansatz, X, cfg: SimConfig, mesh, tile: int | None = None
) -> np.ndarray:
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
            precision=cfg.resolved_tile_precision, symmetric=True,
        )
    )
    if os.environ.get("QMLTPU_NORMALIZE", "1") != "0":
        dg = np.sqrt(np.maximum(np.diag(k), 0.0))
        dg = np.where(dg > 0, dg, 1.0)
        k = k / np.outer(dg, dg)
    return k
