"""Sharded Gram-matrix build over a device mesh.

TPU-native redesign of the reference's MPI distribution
(gpu_backend/kernel_state_ansatz.py:106-452):

reference (MPI)                          | this module (XLA SPMD)
-----------------------------------------+--------------------------------
rank-chunked X, per-rank circuit binding | batch sharded over the mesh; the
and one native simulate() per circuit    | whole padded batch evolves in ONE
                                         | jit-compiled vmapped program, XLA
                                         | partitions it across devices
Y chunks pickled + mpi_comm.sendrecv     | fixed-shape padded MPS blocks
ring round-robin (gpu:415-419)           | rotated with lax.ppermute (ICI)
symmetric mirror entries + skip rules    | mirror tiles ppermute'd to their
(gpu:389-400)                            | column-stripe owner (same skip
                                         | rules: diagonal iteration and the
                                         | last iteration when the device
                                         | count is even)
mpi_comm.reduce(SUM) of full replicated  | disjoint column stripes assembled
matrices (gpu:427-428)                   | by the out_sharding — no reduce
                                         | needed
"""

from __future__ import annotations

import json
import os
import pathlib
import time


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.simulate import make_chunked_simulator
from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.parallel.mesh import AXIS, process_index, to_host


def _pad_rows(arr: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    n = arr.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr, n
    pad = np.repeat(arr[:1], target - n, axis=0)
    return np.concatenate([arr, pad], axis=0), n


def _tile_block(m_carry: Cpx, ty: Cpx, tx: Cpx):
    """One transfer-matrix site step for an all-pairs tile (see
    models/simulate.tile_overlaps_sq)."""
    t = cpx.einsum("yxab,xbsd->yxasd", m_carry, tx)
    return cpx.einsum("yasc,yxasd->yxcd", cpx.conj(ty), t)


def _block_overlaps(ay: Cpx, ax: Cpx):
    """|<y_i|x_j>|^2 for one [Byl] x [Bxl] block (site-scanned)."""
    byl, bxl, chi = ay.re.shape[0], ax.re.shape[0], ax.re.shape[2]
    # Derive the carry init from the inputs so it inherits their
    # varying-manual-axes type under shard_map (a replicated init would make
    # the scan carry types mismatch in jax >= 0.9).
    one = ax.re.reshape(-1)[0] * 0.0 + 1.0
    m0re = jnp.zeros((byl, bxl, chi, chi), ax.re.dtype).at[:, :, 0, 0].set(1.0) * one
    m0 = Cpx(m0re, jnp.zeros_like(m0re))

    def step(m, ts):
        ty_re, ty_im, tx_re, tx_im = ts
        return _tile_block(m, Cpx(ty_re, ty_im), Cpx(tx_re, tx_im)), None

    sm = lambda t: jnp.moveaxis(t, 1, 0)
    m, _ = lax.scan(step, m0, (sm(ay.re), sm(ay.im), sm(ax.re), sm(ax.im)))
    ov = cpx.tmap(lambda t: t[:, :, 0, 0], m)
    return cpx.abs2(ov)


def make_ring_gram(mesh, n_iters: int, symmetric: bool, len_y_pad: int, precision: str):
    """Builds the jitted shard_map ring kernel.

    Each device holds one X block (its column stripe of K) and one Y block;
    Y blocks rotate around the ring ``n_iters`` times. In the symmetric case
    each computed off-diagonal tile is also transposed and ppermute'd to the
    device owning the mirrored column stripe.
    """
    ndev = mesh.devices.size
    fwd_perm = [(d, (d - 1) % ndev) for d in range(ndev)]  # Y ring shift

    def kernel_symmetric(ax, ay):
        # ax, ay: Cpx with local blocks [Bxl/Byl, n, chi, 2, chi].
        # Python loop over iterations: the mirror ppermute permutation
        # depends on i and permutations must be static. n_iters = ndev//2+1.
        idx = lax.axis_index(AXIS)
        byl = ay.re.shape[0]
        bxl = ax.re.shape[0]
        k_local = jnp.zeros((len_y_pad, bxl), dtype=ax.re.dtype)
        ay_cur = ay
        for i in range(n_iters):
            block = _block_overlaps(ay_cur, ax)  # [Byl, Bxl]
            y_block = (idx + i) % ndev
            k_local = lax.dynamic_update_slice(
                k_local, block, (jnp.int32(y_block * byl), jnp.int32(0))
            )

            # Mirror tile K[y_block=idx-i..., x_stripe=idx] comes from the
            # device i steps behind in the ring: route each computed tile's
            # transpose forward with a shift-i ppermute. Skip on the
            # diagonal iteration (i=0) and on the last iteration when ndev
            # is even (both ring endpoints compute that tile directly) —
            # the reference's skip rules (gpu:389-400).
            do_mirror = (i > 0) and not (ndev % 2 == 0 and i == n_iters - 1)
            if do_mirror:
                mirror = jnp.swapaxes(block, 0, 1)  # [Bxl, Byl]
                perm_i = [(d, (d + i) % ndev) for d in range(ndev)]
                recv = lax.ppermute(mirror, AXIS, perm_i)
                src_y_block = (idx - i) % ndev
                k_local = lax.dynamic_update_slice(
                    k_local, recv, (jnp.int32(src_y_block * byl), jnp.int32(0))
                )
            if i + 1 < n_iters:
                ay_cur = cpx.tmap(lambda t: lax.ppermute(t, AXIS, fwd_perm), ay_cur)
        return k_local

    def kernel_general(ax, ay):
        idx = lax.axis_index(AXIS)
        byl = ay.re.shape[0]
        bxl = ax.re.shape[0]
        # Derived from ax so the fori_loop carry is device-varying (vma).
        one = ax.re.reshape(-1)[0] * 0.0 + 1.0
        k_local = jnp.zeros((len_y_pad, bxl), dtype=ax.re.dtype) * one

        def body(i, carry):
            ay_cur, k_loc = carry
            block = _block_overlaps(ay_cur, ax)
            y_block = (idx + i) % ndev
            k_loc = lax.dynamic_update_slice(
                k_loc, block, (jnp.int32(y_block * byl), jnp.int32(0))
            )
            ay_next = cpx.tmap(lambda t: lax.ppermute(t, AXIS, fwd_perm), ay_cur)
            return ay_next, k_loc

        _, k_local = lax.fori_loop(0, n_iters, body, (ay, k_local))
        return k_local

    fn = kernel_symmetric if symmetric else kernel_general

    @jax.jit
    def run(ax_global: Cpx, ay_global: Cpx):
        with jax.default_matmul_precision(precision):
            return jax.shard_map(
                fn,
                mesh=mesh,
                in_specs=(
                    Cpx(P(AXIS), P(AXIS)),
                    Cpx(P(AXIS), P(AXIS)),
                ),
                out_specs=P(None, AXIS),
            )(ax_global, ay_global)

    return run


def make_ring_steps(mesh, n_iters: int, symmetric: bool, precision: str):
    """Stepwise variant of :func:`make_ring_gram`: one jitted shard_map
    program PER RING ITERATION, driven by a host loop.

    Why: at scale one fused ring program runs for minutes — long device
    programs trip RPC watchdogs on tunneled TPU backends (same reason the
    simulator is chunked, models/simulate.make_chunked_simulator), and a
    single program cannot checkpoint. Each step takes and returns the
    rotated Y blocks and the per-device column stripes of K, so the host
    can snapshot K between iterations (the distributed analog of the
    reference CPU backend's per-tile checkpoint, cpu:279-282).

    Returns ``step(i, ax, ay_cur, k) -> (ay_next, k)`` where ``k`` is the
    global ``[len_y_pad, len_x_pad]`` array sharded as column stripes
    ``P(None, AXIS)``. In the symmetric case the mirror ppermute
    permutation depends statically on ``i``, so programs are cached per
    iteration index (n_iters tiny programs, each reused across calls).
    """
    ndev = mesh.devices.size
    fwd_perm = [(d, (d - 1) % ndev) for d in range(ndev)]
    cache: dict = {}

    def build(i: int):
        def body(ax, ay_cur, k_local):
            idx = lax.axis_index(AXIS)
            byl = ay_cur.re.shape[0]
            block = _block_overlaps(ay_cur, ax)  # [Byl, Bxl]
            y_block = (idx + i) % ndev
            k_local = lax.dynamic_update_slice(
                k_local, block.astype(k_local.dtype), (jnp.int32(y_block * byl), jnp.int32(0))
            )
            if symmetric:
                do_mirror = (i > 0) and not (ndev % 2 == 0 and i == n_iters - 1)
                if do_mirror:
                    mirror = jnp.swapaxes(block, 0, 1)
                    perm_i = [(d, (d + i) % ndev) for d in range(ndev)]
                    recv = lax.ppermute(mirror, AXIS, perm_i)
                    src_y_block = (idx - i) % ndev
                    k_local = lax.dynamic_update_slice(
                        k_local,
                        recv.astype(k_local.dtype),
                        (jnp.int32(src_y_block * byl), jnp.int32(0)),
                    )
            if i + 1 < n_iters:
                ay_next = cpx.tmap(lambda t: lax.ppermute(t, AXIS, fwd_perm), ay_cur)
            else:
                ay_next = ay_cur
            return ay_next, k_local

        @jax.jit
        def run(ax_global: Cpx, ay_global: Cpx, k_global):
            with jax.default_matmul_precision(precision):
                return jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(Cpx(P(AXIS), P(AXIS)), Cpx(P(AXIS), P(AXIS)), P(None, AXIS)),
                    out_specs=(Cpx(P(AXIS), P(AXIS)), P(None, AXIS)),
                )(ax_global, ay_global, k_global)

        return run

    def step(i: int, ax, ay_cur, k):
        if i not in cache:
            cache[i] = build(i)
        return cache[i](ax, ay_cur, k)

    return step


def build_kernel_matrix_sharded(
    ansatz,
    X,
    Y=None,
    info_file=None,
    cfg: SimConfig | None = None,
    mesh=None,
    loglevel: int = 30,
    checkpoint: bool = False,
    checkpoint_dir: str = "tmp",
    sim_batch: int = 32,
) -> np.ndarray:
    """Distributed equivalent of models/gram.build_kernel_matrix over a
    1-D mesh. Returns the [lenY, lenX] kernel on the host.

    Simulation is chunked (one bounded SPMD dispatch per op chunk,
    models/simulate.make_chunked_simulator with ``mesh``) and the Gram ring
    runs one jitted program per iteration (``QMLTPU_RING=fused`` restores
    the single-program ring). With ``checkpoint=True`` and an
    ``info_file``, the assembled stripes are snapshotted after each ring
    iteration and a restarted build resumes from the last completed one.

    ``sim_batch``: total rows per simulation dispatch (rounded down to a
    device-count multiple), mirroring the single-device path — the batch
    evolves block-by-block so the C15 circ_sim distribution stats are
    quartiles over per-block means rather than one whole-batch mean.
    """
    assert mesh is not None
    cfg = cfg or SimConfig()
    schedule = ansatz.schedule
    ndev = mesh.devices.size
    verbose = loglevel <= 20

    X = np.asarray(X, dtype=np.float64)
    len_x = len(X)
    symmetric = Y is None
    Yarr = X if symmetric else np.asarray(Y, dtype=np.float64)
    len_y = len(Yarr)

    profiling: dict = {}
    profiling["n_procs"] = [ndev, "devices"]
    profiling["lenX"] = [len_x, "entries"]
    profiling["lenY"] = [None if symmetric else len_y, "entries"]
    start = time.perf_counter()
    profiling["r0_circ_gen"] = [0.0, "seconds"]

    # Rows per simulation dispatch: a device-count multiple so every block
    # shards evenly, capped at the batch's own ndev-padded length so small
    # batches are not inflated. All of one batch's blocks share ONE shape
    # (one compile); the batch is padded up to a block multiple — the same
    # waste bound as the single-device path's sim_batch padding.
    def _block_rows(n: int) -> int:
        return min(max(ndev, sim_batch // ndev * ndev), -(-n // ndev) * ndev)

    block_x = _block_rows(len_x)
    block_y = block_x if symmetric else _block_rows(len_y)
    x_pad, _ = _pad_rows(X, block_x)
    y_pad, _ = _pad_rows(Yarr, block_y)
    len_y_padded = y_pad.shape[0]

    # Chunked SPMD simulation: bounded per-dispatch duration (tunneled TPU
    # watchdogs) with the batch axis sharded over the mesh.
    sim = make_chunked_simulator(schedule, cfg, mesh=mesh)

    def _sim_blocks(feats, block):
        """Evolve ``feats`` block-by-block, timing each dispatch (the C15
        per-batch distribution samples, models/gram.simulate_dataset).
        Returns (out, per-circuit-per-device mean times, one per block)."""
        outs, times = [], []
        for s in range(0, feats.shape[0], block):
            t0 = time.perf_counter()
            outs.append(jax.block_until_ready(sim(feats[s : s + block])))
            times.append((time.perf_counter() - t0) / block * ndev)
        if len(outs) == 1:
            return outs[0], times
        # Equal block shapes (same chi padding) -> a plain batch-axis concat;
        # the ring's shard_map re-shards its inputs, so no explicit
        # device_put is needed here.
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs), times

    t0 = time.perf_counter()
    out_x, x_times = _sim_blocks(x_pad, block_x)
    if symmetric:
        out_y, y_times = out_x, []
    else:
        out_y, y_times = _sim_blocks(y_pad, block_y)
    sim_time = time.perf_counter() - t0
    profiling["r0_circ_sim"] = [sim_time, "seconds"]
    # One sample per dispatched block — the same semantics as the
    # single-device path (quartiles over per-batch means, NOT per-circuit
    # quartiles; batched execution cannot observe single circuits). Flagged
    # via stats_semantics.
    per_block = np.asarray(x_times + y_times)
    profiling["avg_circ_sim"] = [float(np.mean(per_block)), "seconds"]
    profiling["median_circ_sim"] = [float(np.median(per_block)), "seconds"]
    profiling["q1_circ_sim"] = [float(np.percentile(per_block, 25)), "seconds"]
    profiling["q3_circ_sim"] = [float(np.percentile(per_block, 75)), "seconds"]
    profiling["stats_semantics"] = [
        "batched execution: circ_sim stats are quartiles over per-block means"
        " and product stats quartiles over per-ring-iteration means,"
        " not per-circuit/per-pair distribution quartiles",
        "",
    ]

    chi_x = to_host(jnp.max(out_x.bond_dims, axis=-1))[:len_x]
    fid_x = to_host(out_x.fidelity)[:len_x]
    if symmetric:
        chi_y, fid_y = chi_x, np.zeros((0,))
    else:
        # The reference averages X and Y fidelities together and reports the
        # chi stats separately (gpu_backend/kernel_state_ansatz.py:296-316).
        chi_y = to_host(jnp.max(out_y.bond_dims, axis=-1))[:len_y]
        fid_y = to_host(out_y.fidelity)[:len_y]
    profiling["avg_fidelity"] = [float(np.mean(np.concatenate([fid_x, fid_y]))), ""]
    profiling["ave max chi x"] = (float(np.mean(chi_x)), "chi x")
    profiling["ave max chi y"] = (float(np.mean(chi_y)), "chi y")
    profiling["chi"] = [cfg.chi, "bond cap"]

    from qml_cutensornet_tpu.models.gram import _actual_mps_bytes

    itemsize = 2 * jnp.zeros((), cfg.real_dtype).itemsize
    bytes_per_mps = _actual_mps_bytes(chi_x, schedule.num_qubits, itemsize, cfg.chi)
    total_mem = bytes_per_mps * (len_x + len_y) / (1024**2)
    profiling["gpu_mps_mem"] = [float(total_mem / ndev), "MiB"]
    profiling["avg_mps_mem"] = [float(bytes_per_mps / (1024**2)), "MiB"]
    if verbose:
        n_sim = x_pad.shape[0] + (0 if symmetric else y_pad.shape[0])
        print(f"[mesh:{ndev}] simulated {n_sim} MPS in {sim_time:.3f}s")

    n_iters = (ndev // 2) + 1 if symmetric else ndev
    ring_mode = os.environ.get("QMLTPU_RING", "stepwise")

    t0 = time.perf_counter()
    iter_times: list[float] = []
    if ring_mode == "fused":
        ring = make_ring_gram(mesh, n_iters, symmetric, len_y_padded, cfg.resolved_tile_precision)
        k = ring(out_x.tensors, out_y.tensors)
        k = to_host(jax.block_until_ready(k))
    else:
        step = make_ring_steps(mesh, n_iters, symmetric, cfg.resolved_tile_precision)
        stripe_sharding = NamedSharding(mesh, P(None, AXIS))
        len_x_padded = x_pad.shape[0]

        ckpt_file = None
        start_iter = 0
        k_host = np.zeros((len_y_padded, len_x_padded), dtype=np.dtype(cfg.real_dtype))
        if checkpoint and info_file is not None:
            pathlib.Path(checkpoint_dir).mkdir(exist_ok=True)
            ckpt_file = (
                pathlib.Path(checkpoint_dir)
                / f"checkpoint_ring_{pathlib.Path(info_file).name}.npz"
            )
            if process_index() == 0 and ckpt_file.is_file():
                saved = np.load(ckpt_file)
                if saved["k"].shape == k_host.shape:
                    k_host = saved["k"].astype(k_host.dtype)
                    start_iter = int(saved["next_iter"])
                    if verbose:
                        print(f"[mesh:{ndev}] ring resumed at iteration {start_iter}")
            if jax.process_count() > 1:
                # Only process 0 writes the snapshot, and a multi-host
                # deployment need not share a filesystem: broadcast the
                # resume state so every process enters the SAME collective
                # sequence (divergent start_iter values would hang the ring).
                from jax.experimental import multihost_utils

                start_iter, k_host = jax.tree.map(
                    np.asarray,
                    multihost_utils.broadcast_one_to_all(
                        (np.int64(start_iter), k_host)
                    ),
                )
                start_iter = int(start_iter)

        k_dev = jax.device_put(k_host, stripe_sharding)
        ay_cur = out_y.tensors
        # Fast-forward the Y ring to the resume point (ppermute is exact and
        # cheap relative to the skipped tile contractions).
        fwd_perm = [(d, (d - 1) % ndev) for d in range(ndev)]

        @jax.jit
        def rotate(ay):
            return jax.shard_map(
                lambda a: cpx.tmap(lambda t: lax.ppermute(t, AXIS, fwd_perm), a),
                mesh=mesh,
                in_specs=(Cpx(P(AXIS), P(AXIS)),),
                out_specs=Cpx(P(AXIS), P(AXIS)),
            )(ay)

        for _ in range(start_iter):
            ay_cur = rotate(ay_cur)
        for i in range(start_iter, n_iters):
            t_it = time.perf_counter()
            ay_cur, k_dev = step(i, out_x.tensors, ay_cur, k_dev)
            # Sync per iteration: one distribution sample per ring step
            # (iterations are data-dependent serial anyway — each consumes
            # the previous step's rotated Y blocks).
            jax.block_until_ready(k_dev)
            iter_times.append(time.perf_counter() - t_it)
            if ckpt_file is not None:
                k_snap = to_host(jax.block_until_ready(k_dev))
                if process_index() == 0:
                    tmp = ckpt_file.with_suffix(".tmp.npz")
                    np.savez(tmp, k=k_snap, next_iter=i + 1)
                    tmp.replace(ckpt_file)
        k = to_host(jax.block_until_ready(k_dev))
        if ckpt_file is not None and process_index() == 0:
            ckpt_file.unlink(missing_ok=True)
    gram_time = time.perf_counter() - t0

    # Same normalization as the single-device path (models/gram.py): divide
    # out <y|y><x|x> so truncation/roundoff norm deficits cancel.
    if os.environ.get("QMLTPU_NORMALIZE", "1") != "0":
        if symmetric:
            # Normalize by the ring's OWN diagonal (K[i,j]/sqrt(K_ii K_jj)):
            # exactly unit diagonal, and the per-state factors carry the
            # same f32 accumulation rounding as the off-diagonal tiles —
            # separately-computed state norms differ from the tile scan by
            # its rounding (~3e-6 relative), the former chi=96 "flicker"
            # (models/gram.py has the full story).
            dg = np.sqrt(np.maximum(np.diagonal(k), 0.0))
            dg = np.where(dg > 0, dg, 1.0)
            k = k / np.outer(dg, dg)
        else:
            from qml_cutensornet_tpu.models.simulate import state_norms_sq

            # Norms are computed on the PADDED batches, matching k's padded
            # shape. Unlike the single-device path this is one whole-batch
            # jit (slicing a sharded array into host-side chunks would
            # gather); it compiles once per batch size — negligible against
            # a multi-chip-scale build, and the mesh path is not used for
            # CLI-style many-small-runs sweeps.
            n2x = to_host(state_norms_sq(out_x.tensors, precision=cfg.resolved_tile_precision))
            n2y = to_host(state_norms_sq(out_y.tensors, precision=cfg.resolved_tile_precision))
            k = k / np.outer(n2y, n2x)

    profiling["kernel_mat_time"] = [gram_time, "seconds"]
    profiling["r0_product"] = [gram_time, "seconds"]
    n_pairs = max(1, len_y_padded * x_pad.shape[0] // ndev)
    if iter_times:
        # Stepwise ring: one sample per iteration — per-pair-per-device
        # means over the (Byl x Bxl) tile each device contracts per step.
        pairs_per_iter = max(1, (len_y_padded // ndev) * (x_pad.shape[0] // ndev))
        per_it = np.asarray(iter_times) / pairs_per_iter
        profiling["avg_product"] = [float(np.mean(per_it)), "seconds"]
        profiling["median_product"] = [float(np.median(per_it)), "seconds"]
        profiling["q1_product"] = [float(np.percentile(per_it, 25)), "seconds"]
        profiling["q3_product"] = [float(np.percentile(per_it, 75)), "seconds"]
    else:
        # Fused single-program ring exposes only the aggregate.
        per_vdot = gram_time / n_pairs * ndev
        profiling["avg_product"] = [per_vdot, "seconds"]
        profiling["median_product"] = [per_vdot, "seconds"]
        profiling["q1_product"] = [per_vdot, "seconds"]
        profiling["q3_product"] = [per_vdot, "seconds"]
    profiling["r_nonRR_recv"] = [0.0, "seconds"]
    profiling["r0_RR_recv"] = [0.0, "seconds"]
    profiling["total_time"] = [time.perf_counter() - start, "seconds"]
    if verbose:
        print(f"[mesh:{ndev}] gram ring done in {gram_time:.3f}s")

    if info_file is not None:
        with open(str(info_file) + ".json", "w") as fp:
            json.dump(profiling, fp, indent=4)

    return k[:len_y, :len_x].astype(np.float64)
