"""Pallas TPU kernel for the Gram-tile transfer contraction.

Computes ``OV[y, x] = |<y_i|x_j>|^2`` for a block of MPS pairs. The XLA
scan version (models/simulate.tile_overlaps_sq) round-trips the carried
environment ``M [By, Bx, chi, chi]`` through HBM on every site step; this
kernel keeps M resident in VMEM for the whole site loop and streams only
the per-site tensors in via async DMA (double-buffered).

Mosaic lowering constraints shape the data layout:
- no lane-merging reshapes -> the physical index s is split into SEPARATE
  input arrays host-side (8 inputs: {y,x} x {re,im} x {s=0,1}), each a
  clean [n, B, chi, chi] block, so every in-kernel operand is a plain
  [*, chi] tile and every dot an MXU matmul;
- no functional scatters -> the environment is updated in place, column by
  column (each M column is read exactly once before being overwritten);
- output blocks must match trailing dims -> the result is emitted per-block
  as [gy, gx, by, bx] and regrouped on the host.

Complex arithmetic is the framework's (re, im) pair convention: each
complex matmul is 4 real MXU dots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qml_cutensornet_tpu.ops.cpx import Cpx


def _dot(a, b, preferred_element_type=jnp.float32):
    # Mosaic matmuls default to bf16 passes for f32 inputs; full precision
    # is required for kernel parity (same reason as SimConfig.matmul_precision).
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=preferred_element_type,
    )


def _tile_kernel(n_sites, by, bx, chi,
                 yr0, yr1, yi0, yi1, xr0, xr1, xi0, xi1,
                 out_ref, m_re, m_im, bufs, sems):
    """Inputs: HBM refs [n, Bfull, chi, chi] (site-major, s split).
    out_ref: [1, 1, by, bx] VMEM block. m_*: [by, bx, chi, chi] VMEM.
    bufs: [8, 2, max(by,bx), chi, chi] VMEM double buffers. sems: [8, 2].
    """
    iy = pl.program_id(0)
    ix = pl.program_id(1)

    m_re[...] = jnp.zeros((by, bx, chi, chi), jnp.float32)
    m_im[...] = jnp.zeros((by, bx, chi, chi), jnp.float32)
    m_re[:, :, 0, 0] = jnp.ones((by, bx), jnp.float32)

    srcs = [yr0, yr1, yi0, yi1, xr0, xr1, xi0, xi1]
    offs = [iy, iy, iy, iy, ix, ix, ix, ix]
    blks = [by, by, by, by, bx, bx, bx, bx]

    def dma(site, slot):
        return [
            pltpu.make_async_copy(
                srcs[k].at[site, pl.ds(offs[k] * blks[k], blks[k])],
                bufs.at[k, slot, pl.ds(0, blks[k])],
                sems.at[k, slot],
            )
            for k in range(8)
        ]

    for c in dma(0, 0):
        c.start()

    def site_step(site, _):
        slot = site % 2
        nxt = (site + 1) % 2

        @pl.when(site + 1 < n_sites)
        def _():
            for c in dma(site + 1, nxt):
                c.start()

        for c in dma(site, slot):
            c.wait()

        # buffer order matches srcs: y re s0/s1, y im s0/s1, x re s0/s1, x im s0/s1
        for x in range(bx):
            mr = m_re[:, x].reshape(by * chi, chi)
            mi = m_im[:, x].reshape(by * chi, chi)
            t_re, t_im = [], []
            for s in range(2):
                txr = bufs[4 + s, slot, x]  # [chi(b), chi(d)]
                txi = bufs[6 + s, slot, x]
                t_re.append(
                    _dot(mr, txr, preferred_element_type=jnp.float32)
                    - _dot(mi, txi, preferred_element_type=jnp.float32)
                )
                t_im.append(
                    _dot(mr, txi, preferred_element_type=jnp.float32)
                    + _dot(mi, txr, preferred_element_type=jnp.float32)
                )
            for y in range(by):
                pr = jnp.zeros((chi, chi), jnp.float32)
                pi = jnp.zeros((chi, chi), jnp.float32)
                for s in range(2):
                    ar = bufs[0 + s, slot, y]  # [chi(a), chi(c)]
                    ai = bufs[2 + s, slot, y]
                    tr = t_re[s][y * chi : (y + 1) * chi]
                    ti = t_im[s][y * chi : (y + 1) * chi]
                    # M' += (Ty_s)^H T_s with conj -> (ar - i ai)^T
                    pr = pr + _dot(ar.T, tr, preferred_element_type=jnp.float32) \
                            + _dot(ai.T, ti, preferred_element_type=jnp.float32)
                    pi = pi + _dot(ar.T, ti, preferred_element_type=jnp.float32) \
                            - _dot(ai.T, tr, preferred_element_type=jnp.float32)
                m_re[y, x] = pr
                m_im[y, x] = pi
        return ()

    jax.lax.fori_loop(0, n_sites, site_step, (), unroll=False)
    out_ref[0, 0] = m_re[:, :, 0, 0] ** 2 + m_im[:, :, 0, 0] ** 2


def pallas_tile_supported(chi: int) -> bool:
    """The compiled kernel needs lane-aligned matrices (Mosaic tiles the
    last dim to 128 lanes): chi must be a multiple of 128, and the backend
    a real TPU.

    OPT-IN (QMLTPU_PALLAS_TILE=1): measured on v5e round 2, the XLA scan
    version is FASTER at chi <= 128 (e.g. 149 ms vs 428 ms for a 48x48
    tile at chi=64-padded-to-128; the scan sits within ~2x of the
    bandwidth/flop bound), and at chi=256 the kernel's VMEM scratch
    ([by,bx,chi,chi] + 8 double buffers) exceeds the scoped budget. Kept
    for re-evaluation on hardware where the tradeoff flips."""
    import os

    import jax

    if os.environ.get("QMLTPU_PALLAS_TILE", "0") != "1":
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # Mosaic/TPU-only: the kernel uses pltpu.VMEM scratch and TPU DMA
    # primitives, so a GPU backend must NOT take this path.
    return chi % 128 == 0 and platform == "tpu"


def tile_overlaps_sq_padded(ay: Cpx, ax: Cpx, block_y: int = 4, block_x: int = 8):
    """Pallas tile overlaps with automatic batch padding to block multiples
    (padding states are zero tensors -> zero overlaps, sliced away)."""
    By, Bx = ay.re.shape[0], ax.re.shape[0]
    byp = -(-By // block_y) * block_y
    bxp = -(-Bx // block_x) * block_x
    pad = lambda t, n: jnp.pad(t, [(0, n - t.shape[0])] + [(0, 0)] * (t.ndim - 1))
    ayp = Cpx(pad(ay.re, byp), pad(ay.im, byp)) if byp != By else ay
    axp = Cpx(pad(ax.re, bxp), pad(ax.im, bxp)) if bxp != Bx else ax
    out = tile_overlaps_sq_pallas(ayp, axp, block_y, block_x)
    return out[:By, :Bx]


@partial(jax.jit, static_argnames=("block_y", "block_x", "interpret"))
def tile_overlaps_sq_pallas(ay: Cpx, ax: Cpx, block_y: int = 8, block_x: int = 8,
                            interpret: bool = False):
    """Pallas tile overlaps: ``ay [By, n, chi, 2, chi]``, ``ax [Bx, ...]``
    (Cpx, f32) -> ``[By, Bx]`` of |<y|x>|^2. By/Bx must be multiples of the
    block sizes (pad on the caller side)."""
    By, n, chi = ay.re.shape[0], ay.re.shape[1], ay.re.shape[2]
    Bx = ax.re.shape[0]
    assert By % block_y == 0 and Bx % block_x == 0

    def prep(t, s):
        # [B, n, chi, 2, chi] -> site-major per-s [n, B, chi, chi]
        return jnp.moveaxis(t[:, :, :, s, :], 1, 0).astype(jnp.float32)

    args = (
        prep(ay.re, 0), prep(ay.re, 1), prep(ay.im, 0), prep(ay.im, 1),
        prep(ax.re, 0), prep(ax.re, 1), prep(ax.im, 0), prep(ax.im, 1),
    )

    kernel = partial(_tile_kernel, n, block_y, block_x, chi)
    grid = (By // block_y, Bx // block_x)
    blocked = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=pl.BlockSpec(
            (1, 1, block_y, block_x),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], grid[1], block_y, block_x), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_y, block_x, chi, chi), jnp.float32),
            pltpu.VMEM((block_y, block_x, chi, chi), jnp.float32),
            pltpu.VMEM((8, 2, max(block_y, block_x), chi, chi), jnp.float32),
            pltpu.SemaphoreType.DMA((8, 2)),
        ],
        interpret=interpret,
    )(*args)
    return blocked.transpose(0, 2, 1, 3).reshape(By, Bx)