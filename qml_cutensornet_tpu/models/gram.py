"""Gram (kernel) matrix construction.

Reference behavior being reproduced (gpu_backend/kernel_state_ansatz.py:106-452,
cpu_backend/kernel_state_ansatz.py:134-328):

- ``build_kernel_matrix(ansatz, X, Y=None, ...) -> np.ndarray[lenY, lenX]``
  with ``K[i, j] = |<psi(Y_i)|psi(X_j)>|^2``.
- Requires ``len(Y) <= len(X)`` (gpu:136-137).
- ``Y=None`` means ``Y == X``; symmetry is exploited (compute the lower
  block-triangle, mirror the rest — reference gpu:389-400, cpu:270-274).
- A profiling dict with the reference's key schema is written to
  ``{info_file}.json`` (gpu:157-450) so downstream ``to_csv.py``-style
  analysis keeps working.
- Optional per-tile checkpoint/resume (reference CPU backend, cpu:212-282).

TPU-first differences: circuits are not materialized per datapoint — the
batch is simulated in one compiled program per chunk, and kernel tiles are
batched transfer-matrix contractions (models/simulate.py). When a
``jax.sharding.Mesh`` is supplied, work is distributed over the mesh via
``shard_map`` + ``ppermute`` (parallel/gram.py) instead of MPI ranks.
"""

from __future__ import annotations

import json
import os
import pathlib
import time
from statistics import mean, median

import jax
import jax.numpy as jnp
import numpy as np

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
from qml_cutensornet_tpu.models.simulate import make_chunked_simulator, tile_overlaps_sq
from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.cpx import Cpx


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    n = arr.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    pad = np.repeat(arr[:1], target - n, axis=0)
    return np.concatenate([arr, pad], axis=0)


def _chi_bucket(max_chi: int, padded_chi: int) -> int:
    """Smallest multiple-of-64 chi >= the batch's actual tracked rank
    (floored at 128 so small configs' compiled tile programs stay warm),
    capped at the simulator's padding. Slicing MPS tensors down to this is
    LOSSLESS: bond padding beyond each bond's kept rank is exact zeros by
    the engine invariant (docs/DESIGN.md numerics ledger). 64-granularity:
    HBM storage and host/tunnel transfers are compact at any multiple of
    64; XLA pads the lane dimension to 128 only inside vector registers."""
    b = max(128, -(-int(max_chi) // 64) * 64)
    return min(b, padded_chi)


def simulate_dataset(schedule, features: np.ndarray, cfg: SimConfig, sim_batch: int):
    """Simulate all datapoint circuits, ``sim_batch`` at a time, in one
    compiled XLA program per chunk. Returns (tensors [N, n, chi, 2, chi],
    fidelities [N], max_chis [N], per_batch_times list).

    Large-chi memory: each batch is sliced to its chi bucket (see
    ``_chi_bucket``) and fetched to HOST memory, so HBM never holds more
    than one in-flight batch at full padding — at chi=1024, nq=100, ten
    states at full padding are 15.6 GB, more than a v5e's HBM. The
    assembled result lives on host (numpy) when it exceeds
    ``QMLTPU_STATES_DEVICE_BYTES`` (default 10e9 — leaves ~6 GB of a v5e's
    16 GB HBM for the tile scan's carry and temporaries); the tile loop
    then uploads one tile block per dispatch instead."""
    n_pts = features.shape[0]
    padded = _pad_rows(np.asarray(features, dtype=np.float64), sim_batch)
    sim = make_chunked_simulator(schedule, cfg)
    device_limit = float(os.environ.get("QMLTPU_STATES_DEVICE_BYTES", "10e9"))
    n_batches = padded.shape[0] // sim_batch
    keep_device = None  # decided from the first batch's compiled shape
    tensors, fids, chis, batch_times = [], [], [], []
    buckets = []
    for start in range(0, padded.shape[0], sim_batch):
        chunk = padded[start : start + sim_batch]
        t0 = time.perf_counter()
        out = sim(chunk)
        out = jax.block_until_ready(out)
        batch_times.append(time.perf_counter() - t0)
        batch_chis = np.asarray(jnp.max(out.bond_dims, axis=-1))
        t = out.tensors
        # Slice to the batch's chi bucket FIRST (lossless: bond padding is
        # exact zeros by the engine invariant) so both the residency
        # decision and any host fetch see the compact size — at a chi=256
        # cap with actual rank <= 192, deciding on the padded size pushed
        # the 32q chi256 bench onto the host path and its tunneled
        # round-trip cost ~900 s of a 1109 s wall (runs/perf_ab).
        c = _chi_bucket(int(batch_chis.max(initial=1)), t.re.shape[2])
        buckets.append(c)
        if c < t.re.shape[2]:
            t = cpx.tmap(lambda a: a[:, :, :c, :, :c], t)
        # Residency decision, RE-EVALUATED as buckets grow: the projected
        # assembled footprint (re+im, plus the one-off concat copy) uses
        # the LARGEST bucket seen so far — deciding once from the first
        # batch's bucket locked chi-1024 crossover states onto the device
        # (first circuit bucketed 512 -> "fits"), then later 1024-bucket
        # batches padded the device concat to 13.4 GB and the tile slice
        # copies exhausted HBM (round-5 failure). When the projection
        # flips, already-kept device batches demote to host. The host
        # round-trip stays reserved for the truly large regime: through a
        # tunneled backend it costs ~GB of transfers (measured 3.1 s ->
        # 58 s on the 32q chi64 bench when applied unconditionally).
        c_max = max(buckets)
        itemb = t.re.dtype.itemsize
        n_sites = t.re.shape[1]
        per_batch_max = sim_batch * n_sites * c_max * 2 * c_max * itemb
        projected = 2 * 2 * per_batch_max * n_batches
        if keep_device is None:
            keep_device = projected <= device_limit
        elif keep_device and projected > device_limit:
            keep_device = False
            tensors = [
                p if isinstance(p.re, np.ndarray)
                else Cpx(np.asarray(p.re), np.asarray(p.im))
                for p in tensors
            ]
        if keep_device:
            tensors.append(t)  # device-resident, sliced to its own bucket
        else:
            # Host fetch: frees the batch's HBM before the next sim dispatch.
            t = Cpx(np.asarray(t.re), np.asarray(t.im))
            tensors.append(t)
        fids.append(np.asarray(out.fidelity))
        chis.append(batch_chis)

    c = max(buckets)

    def _pad_to_bucket(p, xp):  # pad one batch to the global bucket (exact zeros)
        if p.shape[2] == c:
            return p
        return xp.pad(
            p, ((0, 0), (0, 0), (0, c - p.shape[2]), (0, 0), (0, c - p.shape[4]))
        )

    if keep_device:
        re = jnp.concatenate([_pad_to_bucket(t.re, jnp) for t in tensors], axis=0)[:n_pts]
        im = jnp.concatenate([_pad_to_bucket(t.im, jnp) for t in tensors], axis=0)[:n_pts]
        tensors = Cpx(re, im)
    else:
        re = np.concatenate([_pad_to_bucket(t.re, np) for t in tensors], axis=0)[:n_pts]
        im = np.concatenate([_pad_to_bucket(t.im, np) for t in tensors], axis=0)[:n_pts]
        if 2 * re.nbytes <= device_limit:
            tensors = Cpx(jnp.asarray(re), jnp.asarray(im))
        else:
            tensors = Cpx(re, im)  # host-resident; tile loop uploads per block
    fids = np.concatenate(fids)[:n_pts]
    chis = np.concatenate(chis)[:n_pts]
    return tensors, fids, chis, batch_times


def _tile_ranges(n: int, tile: int):
    return [(s, min(n, s + tile)) for s in range(0, n, tile)]


def _auto_tile(
    tile: int, chi: int, n: int, len_y: int, len_x: int, site_block: int = 1
) -> int:
    """Clamp the requested tile so one tile dispatch fits HBM at large chi.

    The tile scan's live set is two state blocks ``[tile, n, chi, 2, chi]``
    (re+im) plus the ``M [tile, tile, chi, chi]`` carry — and XLA's
    remat-with-compression pass materializes transposed carry copies whose
    minor dims are the TILE axes, lane-padded to 128 (measured: tile=32 at
    chi=512 allocates 2 x 4 GB padded carry copies on a 2 GB carry and
    OOMs a 16 GB v5e next to the resident states — the crossover CPU-
    criterion d10 failure, runs/crossover). Model both terms (padding
    factor 128/tile on the carry copies) against ``QMLTPU_TILE_BYTES``
    (default 8e9, leaving headroom for device-resident states under
    QMLTPU_STATES_DEVICE_BYTES) and shrink the tile, never below 8. Small
    chi never triggers the clamp, so the warm-program economics of padding
    tiny datasets to one canonical tile shape are untouched there."""
    # 9.2e9 keeps the measured-good chi512/tile=8 crossover config (its
    # modeled live set is 8.98 GB) while chi1024 descends to tile=2.
    budget = float(os.environ.get("QMLTPU_TILE_BYTES", "9.2e9"))
    del len_y, len_x  # tile shapes are padded, not dataset-bound
    k = max(1, site_block)
    t = tile
    # Floor 2 (was 8): at chi=1024, nq=100 the two [tile, n, chi, 2, chi]
    # tile input blocks alone are 13.4 GB PER SIDE at tile=8 — the old
    # floor made the chi1024 crossover tile program ask 33 GB of HBM and
    # die at compile (round-5 run). tile=2 fits (~10 GB live).
    while t > 2:
        pad = max(1, 128 // t)
        carry = 4 * t * t * chi * chi * (2 * pad + 2)
        blocks = 2 * (8 * t * n * 2 * chi * chi)
        # site_block=k costs beyond per-site (simulate._combine_sites NOTE):
        # the pre-combined blocks (2^k/(2k) of the inputs' size) coexist
        # with the un-donated originals, and the scan-step matmul temps
        # t1/t2 are [t, t*chi, 2^k*chi] re+im pairs — the dominant term at
        # k >= 2 and large chi.
        combined = (blocks * (2 ** k)) // (2 * k) if k > 1 else 0
        temps = 8 * t * t * chi * chi * (2 ** k) if k > 1 else 0
        if carry + blocks + combined + temps <= budget:
            break
        t = t - 8 if t > 8 else t // 2
    return t


def build_kernel_matrix(
    ansatz: KernelStateAnsatz,
    X,
    Y=None,
    info_file=None,
    truncation_error=None,
    loglevel: int = 30,
    cfg: SimConfig | None = None,
    sim_batch: int = 32,
    tile: int = 32,
    mesh=None,
    checkpoint: bool = False,
    checkpoint_dir: str = "tmp",
) -> np.ndarray:
    """Compute ``K[i, j] = |<psi(Y_i)|psi(X_j)>|^2`` for all pairs.

    Args mirror the reference engines; ``cfg`` carries the TPU-specific
    knobs (bond cap chi, dtype, svd method). If ``cfg`` is None it is
    built from ``truncation_error`` with defaults.

    ``mesh``: optional ``jax.sharding.Mesh`` with one axis — distributes the
    build across devices (see parallel/gram.py).
    """
    from qml_cutensornet_tpu.utils.jaxenv import ensure_precision, setup_compilation_cache

    setup_compilation_cache()
    X = np.asarray(X, dtype=np.float64)
    if Y is not None and len(X) < len(np.asarray(Y)):
        # Same contract as the reference (gpu:136-137).
        raise ValueError(
            "X must not be smaller than Y. Swap input order and transpose output."
        )
    if cfg is None:
        if truncation_error is None:
            raise ValueError("You must specify a truncation error.")
        cfg = SimConfig(truncation_error=truncation_error)
    ensure_precision(cfg)
    verbose = loglevel <= 20

    if mesh is not None:
        from qml_cutensornet_tpu.parallel.gram import build_kernel_matrix_sharded

        return build_kernel_matrix_sharded(
            ansatz, X, Y, info_file=info_file, cfg=cfg, mesh=mesh, loglevel=loglevel,
            checkpoint=checkpoint, checkpoint_dir=checkpoint_dir, sim_batch=sim_batch,
        )

    schedule = ansatz.schedule
    len_x = len(X)
    len_y = len_x if Y is None else len(np.asarray(Y))

    profiling: dict = {}
    profiling["n_procs"] = [len(jax.devices()), "devices"]
    profiling["lenX"] = [len_x, "entries"]
    profiling["lenY"] = [None if Y is None else len_y, "entries"]
    start_time = time.perf_counter()

    # --- Simulate all MPS (the reference's "circuit generation" collapses
    # into schedule compilation, done once in the KernelStateAnsatz ctor). ---
    profiling["r0_circ_gen"] = [0.0, "seconds"]
    ax, fid_x, chi_x, times_x = simulate_dataset(schedule, X, cfg, sim_batch)
    if Y is not None:
        ay, fid_y, chi_y, times_y = simulate_dataset(
            schedule, np.asarray(Y, dtype=np.float64), cfg, sim_batch
        )
    else:
        ay, fid_y, chi_y, times_y = ax, fid_x, chi_x, []

    sim_times = times_x + times_y
    # Per-circuit estimates: batched execution means we only observe
    # per-batch wall-clock; report per-circuit averages within each batch.
    n_batches_pts = [min(sim_batch, len_x)] * len(times_x) + [
        min(sim_batch, len_y)
    ] * len(times_y)
    per_circ = [t / p for t, p in zip(sim_times, n_batches_pts) for _ in range(p)]
    profiling["r0_circ_sim"] = [sum(sim_times), "seconds"]
    profiling["avg_circ_sim"] = [mean(per_circ), "seconds"]
    profiling["median_circ_sim"] = [median(per_circ), "seconds"]
    profiling["q1_circ_sim"] = [float(np.percentile(per_circ, 25)), "seconds"]
    profiling["q3_circ_sim"] = [float(np.percentile(per_circ, 75)), "seconds"]
    profiling["stats_semantics"] = [
        "batched execution: circ_sim quartiles are over per-batch means"
        " (within-batch times are not individually observable);"
        " product quartiles are over per-tile means",
        "",
    ]
    profiling["chi"] = [cfg.chi, "bond cap"]

    itemsize = 2 * jnp.zeros((), cfg.real_dtype).itemsize  # (re, im) pair
    bytes_per_mps = _actual_mps_bytes(chi_x, schedule.num_qubits, itemsize, cfg.chi)
    total_mem = (bytes_per_mps * (len_x + len_y)) / (1024**2)
    profiling["gpu_mps_mem"] = [float(total_mem), "MiB"]
    profiling["avg_mps_mem"] = [float(total_mem / (len_x + len_y)), "MiB"]
    all_fids = np.concatenate([fid_x, fid_y]) if Y is not None else fid_x
    profiling["avg_fidelity"] = [float(np.mean(all_fids)), ""]
    profiling["ave max chi x"] = (float(np.mean(chi_x)), "chi x")
    profiling["ave max chi y"] = (float(np.mean(chi_y)), "chi y")
    profiling["r_nonRR_recv"] = [0.0, "seconds"]
    profiling["r0_RR_recv"] = [0.0, "seconds"]

    if verbose:
        print(f"Simulated {len_x + (len_y if Y is not None else 0)} MPS "
              f"in {sum(sim_times):.3f}s (avg chi {np.mean(chi_x):.1f}).")

    # --- Kernel tiles. ---
    # Pad the state batches to tile multiples with EXACT-ZERO states so
    # every tile dispatch has the same shape: ragged edge tiles would each
    # trigger a fresh compile per dataset size (minutes through the AOT
    # compile service). Zero states give zero overlaps; the padded rows and
    # columns are sliced away before normalization.
    tiling_start = time.perf_counter()
    tile = _auto_tile(
        tile, max(ax.re.shape[2], ay.re.shape[2]), ax.re.shape[1], len_y, len_x,
        site_block=cfg.tile_block,
    )
    len_y_pad = -(-len_y // tile) * tile
    len_x_pad = -(-len_x // tile) * tile

    def _pad_states(t: Cpx, target: int) -> Cpx:
        if t.re.shape[0] == target:
            return t
        pad = target - t.re.shape[0]
        # Host-resident batches (large chi, see simulate_dataset) must pad
        # with np: jnp.pad would silently upload the whole array to HBM.
        xp = np if isinstance(t.re, np.ndarray) else jnp
        return cpx.tmap(
            lambda a: xp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)), t
        )

    ay = _pad_states(ay, len_y_pad)
    ax = _pad_states(ax, len_x_pad)
    kernel_mat = np.zeros((len_y_pad, len_x_pad))

    ckpt_file = None
    ckpt_interval = float(os.environ.get("QMLTPU_CKPT_INTERVAL", "0"))
    last_ckpt = -float("inf")  # first eligible tile always saves
    if checkpoint and info_file is not None:
        pathlib.Path(checkpoint_dir).mkdir(exist_ok=True)
        ckpt_file = pathlib.Path(checkpoint_dir) / f"checkpoint_{pathlib.Path(info_file).name}.npy"
        if ckpt_file.is_file():
            loaded = np.load(ckpt_file)
            if loaded.shape == kernel_mat.shape:
                kernel_mat = loaded
                if verbose:
                    print("Recovered from checkpoint!")
            else:
                # A checkpoint written under a different tile size has a
                # different padded shape AND different tile boundaries; the
                # per-tile skip test (corner != 0) would then treat a
                # partially-covered new tile as complete and silently leave
                # its uncomputed region zero. Discard it and recompute.
                if verbose:
                    print(
                        "Checkpoint shape "
                        f"{loaded.shape} != {kernel_mat.shape} (tile size "
                        "changed); discarding it and recomputing."
                    )

    vdot_time: list[float] = []
    tile_pairs: list[int] = []  # true (unpadded) pair count per tile
    y_ranges = _tile_ranges(len_y_pad, tile)
    x_ranges = _tile_ranges(len_x_pad, tile)
    symmetric = Y is None
    # Tile contraction: the XLA transfer-matrix scan (models/simulate.py
    # tile_overlaps_sq). A VMEM-resident Pallas tile kernel was measured
    # SLOWER in round 2 (428 vs 149 ms at chi=64-padded-128) and cannot fit
    # VMEM at chi >= 256; it was retired in round 3 (docs/ROADMAP.md has
    # the measured table and rationale).
    for (y0, y1) in y_ranges:
        for (x0, x1) in x_ranges:
            if symmetric and x0 > y0:
                continue  # upper block-triangle comes from the mirror
            if ckpt_file is not None and kernel_mat[y0, x0] != 0:
                continue  # tile already in the checkpoint (cpu:251-253)
            t0 = time.perf_counter()
            # Stage blocks to device EXPLICITLY (no-op when device-resident)
            # and share the buffer on symmetric diagonal tiles: two separate
            # host->HBM uploads of the same block would double its footprint
            # exactly where the tile arguments are largest. Host-resident
            # blocks are additionally trimmed to the TILE's own chi bucket
            # (lossless — exact-zero padding invariant), so one
            # cap-saturating state elsewhere in the batch cannot blow up
            # every tile's upload; the few distinct bucket shapes each
            # compile once.
            if isinstance(ay.re, np.ndarray):
                c_t = _chi_bucket(
                    int(
                        max(
                            chi_y[y0:min(y1, len_y)].max(initial=1),
                            chi_x[x0:min(x1, len_x)].max(initial=1),
                        )
                    ),
                    ay.re.shape[2],
                )
                trim = lambda t: jnp.asarray(t[:, :, :c_t, :, :c_t])
            else:
                trim = jnp.asarray
            ay_blk = cpx.tmap(lambda t: trim(t[y0:y1]), ay)
            if symmetric and x0 == y0:
                ax_blk = ay_blk
            else:
                ax_blk = cpx.tmap(lambda t: trim(t[x0:x1]), ax)
            block = tile_overlaps_sq(ay_blk, ax_blk, precision=cfg.resolved_tile_precision,
                                     site_block=cfg.tile_block)
            block = np.asarray(jax.block_until_ready(block))
            vdot_time.append(time.perf_counter() - t0)
            tile_pairs.append(
                max(1, (min(y1, len_y) - y0) * (min(x1, len_x) - x0))
            )
            kernel_mat[y0:y1, x0:x1] = block
            if symmetric and x0 < y0:
                kernel_mat[x0:x1, y0:y1] = block.T
            if ckpt_file is not None and (
                time.perf_counter() - last_ckpt >= ckpt_interval
            ):
                # Atomic write (tmp + rename): a crash mid-save must not
                # leave a torn checkpoint. The reference re-saves after EVERY
                # tile (cpu:279-282) — O(N^2) write cost per tile; at scale,
                # set QMLTPU_CKPT_INTERVAL seconds to amortize (resume then
                # re-computes at most the last interval's tiles).
                tmp = ckpt_file.with_suffix(".tmp.npy")
                np.save(tmp, kernel_mat)
                tmp.replace(ckpt_file)
                last_ckpt = time.perf_counter()

    if ckpt_file is not None:
        ckpt_file.unlink(missing_ok=True)

    kernel_mat = kernel_mat[:len_y, :len_x]

    # Normalize out the states' norm deficits (truncation fidelity + f32
    # norm drift): K'[i,j] = |<y|x>|^2 / (<y|y><x|x>). The exact kernel has
    # unit diagonal; the reference leaves the deficit in (its eps=1e-16
    # makes it ~1e-12, gpu:141-144) — at a binding chi cap dividing it out
    # moves entries TOWARD the exact kernel. QMLTPU_NORMALIZE=0 restores
    # raw products.
    #
    # Symmetric case: normalize by the tile path's OWN diagonal,
    # K[i,j]/sqrt(K[i,i] K[j,j]) — NOT by separately-computed state norms.
    # The two would be equal in exact arithmetic, but state_norms_sq
    # accumulates through a different reduction structure than the tile
    # scan; at f32 the two can disagree by the scan's rounding (~3e-6
    # relative, chi-layout dependent), which lands on the diagonal where
    # K=1 — this was the whole of the chi=96 "mask-boundary flicker"
    # (docs/PARITY.md). Diagonal-based normalization makes the diagonal
    # exactly 1 by construction and keeps the per-state rounding consistent
    # with how the off-diagonal tiles were accumulated.
    if os.environ.get("QMLTPU_NORMALIZE", "1") != "0":
        if Y is None:
            dg = np.sqrt(np.maximum(np.diag(kernel_mat), 0.0))
            dg = np.where(dg > 0, dg, 1.0)
            kernel_mat = kernel_mat / np.outer(dg, dg)
        else:
            n2x = _norms_chunked(ax, tile, cfg.resolved_tile_precision)
            n2y = _norms_chunked(ay, tile, cfg.resolved_tile_precision)
            kernel_mat = kernel_mat / np.outer(n2y[:len_y], n2x[:len_x])

    tiling_duration = time.perf_counter() - tiling_start
    total_duration = time.perf_counter() - start_time
    # Per-vdot estimate from each tile's OWN pair count (edge tiles are
    # smaller than `tile` x `tile`; dividing by the average pair count would
    # misattribute their time).
    per_vdot = [t / p for t, p in zip(vdot_time, tile_pairs)]
    profiling["kernel_mat_time"] = [tiling_duration, "seconds"]
    profiling["total_time"] = [total_duration, "seconds"]
    profiling["r0_product"] = [sum(vdot_time), "seconds"]
    if per_vdot:
        profiling["avg_product"] = [mean(per_vdot), "seconds"]
        profiling["median_product"] = [median(per_vdot), "seconds"]
        profiling["q1_product"] = [float(np.percentile(per_vdot, 25)), "seconds"]
        profiling["q3_product"] = [float(np.percentile(per_vdot, 75)), "seconds"]

    if info_file is not None:
        with open(str(info_file) + ".json", "w") as fp:
            json.dump(profiling, fp, indent=4)

    return kernel_mat


def _norms_chunked(a: Cpx, chunk: int, precision: str) -> np.ndarray:
    """Per-state squared norms computed in FIXED-SIZE padded batches so the
    jitted scan compiles once per (chunk, n, chi) — a full-batch call would
    recompile for every dataset size (measured: minutes per shape through
    the AOT compile service)."""
    from qml_cutensornet_tpu.models.simulate import state_norms_sq

    n = a.re.shape[0]
    out = []
    for s in range(0, n, chunk):
        blk = cpx.tmap(lambda t: t[s : s + chunk], a)
        if blk.re.shape[0] < chunk:
            pad = chunk - blk.re.shape[0]
            blk = cpx.tmap(
                lambda t: jnp.pad(t, ((0, pad),) + ((0, 0),) * (t.ndim - 1)), blk
            )
        out.append(np.asarray(state_norms_sq(blk, precision=precision)))
    return np.concatenate(out)[:n]


def _actual_mps_bytes(max_chis, n_sites, itemsize, chi_cap):
    """Rough unpadded memory estimate per MPS: bond dims ramp up as
    min(2^k, 2^(n-k), chi)."""
    chi = float(np.mean(max_chis)) if len(np.atleast_1d(max_chis)) else 1.0
    total = 0.0
    for k in range(n_sites):
        left = min(2.0**k, 2.0 ** (n_sites - k), chi)
        right = min(2.0 ** (k + 1), 2.0 ** (n_sites - k - 1), chi)
        total += left * 2 * right
    return total * itemsize
