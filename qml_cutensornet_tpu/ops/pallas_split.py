"""Pallas TPU kernel: FUSED batched subspace factorization.

The production two-site update (ops/svd._split_subspace, iters == 1) is a
five-stage chain per gate:

    w = theta^H v0  ->  w = orth(w)  ->  v = theta w  ->  q = orth(v)
    ->  r = q^H theta

On the XLA path that is three matmul dispatches plus two Pallas
orthonormalizer launches, each round-tripping theta-sized tensors through
HBM. At production sizes (chi = 64..128, so theta is [128,128]..[256,256]
per batch element) the whole working set fits VMEM, which is exactly the
regime where fusion pays on this hardware (the same lesson as the BCGS2
orthonormalizer, ops/pallas_qr.py — and the opposite regime from the
retired Gram-tile kernel, docs/ROADMAP.md). This kernel runs the full
chain in ONE launch: theta is loaded once, every intermediate lives in
VMEM/registers, and only (q, r) are written back.

Numerics: identical ALGORITHM to the unfused TPU path — the two
orthonormalizations reuse the exact BCGS2 body (pallas_qr.orth_rows_body,
including the dependent-column zeroing that preserves the exact-zero
padding invariant), and every contraction is lax.dot_general with
precision=HIGHEST (bf16 passes would destroy orthogonality — CLAUDE.md).
Only f32 summation order differs from the XLA einsums, i.e. the same
class of rounding delta as any XLA fusion change; the truncation mask,
normalization, and parity ledger are computed downstream from (q, r)
exactly as before (ops/svd.py).

Everything is stored in ROWS layout inside the kernel ([batch, nvec, len],
vectors on the lane dimension):

    w_rows = v0^T conj(theta)        # == (theta^H v0)^T, contract m
    w_rows = orth_rows(w_rows)       # scratch refs
    v_rows = w_rows theta^T          # == (theta w)^T, contract k
    q_rows = orth_rows(v_rows)       # output ref
    r      = conj(q_rows) theta      # == q^H theta, contract m

Replaces (when eligible): the matmul+orth chain in ops/svd._split_subspace.
Reference hot op: cuTensorNet's per-gate truncated SVD
(gpu_backend/kernel_state_ansatz.py:213-231).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops.pallas_qr import PANEL, orth_rows_body

_HI = lax.Precision.HIGHEST


def fused_split_supported(
    m: int, k: int, keep: int, dtype, iters: int = 1, interpret: bool = False
) -> bool:
    """Kernel eligibility: TPU platform (or interpret mode — CPU CI), f32,
    panel-aligned keep, VMEM-scale shapes. Whether to USE the kernel is the
    caller's cfg.fused_split — a static jit argument, NOT an env read at
    trace time (nested-jit jaxpr caches would go stale on env flips). Off
    the eligible range ops/svd.py keeps the unfused path (which itself
    routes its orths through pallas_qr/blocked_qr)."""
    if dtype != jnp.float32:
        return False
    if keep % PANEL != 0 or keep > 128 or m % 8 != 0 or k % 8 != 0:
        return False
    # Each extra power iteration unrolls two more orth bodies + dots into
    # the kernel (Mosaic compile time); 2 covers every shipped config.
    if iters > 2:
        return False
    # theta plus the rows buffers must fit VMEM with a usable batch block;
    # chi <= 128 (m = k = 256) is the measured-useful range. Above it the
    # streaming blocked-QR path owns the regime (ops/blocked_qr.py).
    if m > 256 or k > 256:
        return False
    if interpret:  # CI: exercise the real svd.py routing without a TPU
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def _cmul_dot(ar, ai, br, bi, dn, conj_a=False, conj_b=False):
    """Complex matmul on (re, im) pairs via four real dot_generals."""
    sa = -1.0 if conj_a else 1.0
    sb = -1.0 if conj_b else 1.0
    dot = lambda x, y: lax.dot_general(
        x, y, dn, preferred_element_type=jnp.float32, precision=_HI
    )
    re = dot(ar, br) - sa * sb * dot(ai, bi)
    im = sb * dot(ar, bi) + sa * dot(ai, br)
    return re, im


def _split_chain(iters, thr, thi, v0r_ref, v0i_ref,
                 qr_ref, qi_ref, rr_ref, ri_ref,
                 wr_ref, wi_ref, v_scratch, pair=False):
    """The VMEM-resident subspace-split chain on theta VALUES ``thr, thi``
    ``[B, m, k]`` — shared by the theta-input kernel and the fused
    gate+theta-build kernel. ``iters`` power iterations, each a
    theta^H-multiply -> orth -> theta-multiply -> orth round trip (the
    inter-multiply orthonormalization is the iters==1 path's conditioning
    trick applied uniformly; for iters > 1 the unfused XLA branch instead
    forms h = theta theta^H and orthonormalizes once per h-multiply — the
    spans are identical in exact arithmetic, this form is the
    better-conditioned one at f32)."""
    B, m, k = thr.shape

    dn_v0 = (((1,), (1,)), ((0,), (0,)))   # [B,m,keep] x [B,m,k]
    dn_rows = (((2,), (1,)), ((0,), (0,)))  # [B,keep,m] x [B,m,k]
    dn_k = (((2,), (2,)), ((0,), (0,)))     # [B,keep,k] x [B,m,k]

    vr = vi = None  # rows [B, keep, m] once set
    for it in range(iters):
        if it == 0:
            keep = qr_ref.shape[1]
            v0r = jnp.broadcast_to(v0r_ref[:][None], (B, m, keep))
            v0i = jnp.broadcast_to(v0i_ref[:][None], (B, m, keep))
            # w_rows = v0^T conj(theta): contract m -> [B, keep, k]
            wr, wi = _cmul_dot(v0r, v0i, thr, thi, dn_v0, conj_b=True)
        else:
            # w_rows = v_rows conj(theta): contract m -> [B, keep, k]
            wr, wi = _cmul_dot(vr, vi, thr, thi, dn_rows, conj_b=True)
        orth_rows_body(wr, wi, wr_ref, wi_ref, pair=pair)

        # v_rows = w_rows theta^T: contract k -> [B, keep, m]
        vr_n, vi_n = _cmul_dot(wr_ref[:], wi_ref[:], thr, thi, dn_k)
        if it == iters - 1:
            orth_rows_body(vr_n, vi_n, qr_ref, qi_ref, pair=pair)
        else:
            orth_rows_body(vr_n, vi_n, v_scratch[0], v_scratch[1], pair=pair)
            vr = v_scratch[0][:]
            vi = v_scratch[1][:]

    # r = conj(q_rows) theta: contract m -> [B, keep, k]
    rr, ri = _cmul_dot(qr_ref[:], qi_ref[:], thr, thi, dn_rows, conj_a=True)
    rr_ref[:] = rr
    ri_ref[:] = ri


def _make_split_kernel(iters: int, pair: bool = False):
    """Kernel body: theta given as an input ref (phase 1)."""

    def kernel(thr_ref, thi_ref, v0r_ref, v0i_ref,
               qr_ref, qi_ref, rr_ref, ri_ref,
               wr_ref, wi_ref, *v_scratch):
        _split_chain(iters, thr_ref[:], thi_ref[:], v0r_ref, v0i_ref,
                     qr_ref, qi_ref, rr_ref, ri_ref,
                     wr_ref, wi_ref, v_scratch, pair=pair)

    return kernel


def _make_gate_split_kernel(iters: int, chi: int, pair: bool = False):
    """Kernel body: build theta IN-KERNEL from the two site tensors and the
    per-element 4x4 gate, then run the split chain (phase 2 — saves the
    theta0/theta HBM round trips AND the two XLA matmul dispatches per
    two-site op; see ``gate_split_supported``).

    Layouts (chosen so every quadrant is a CONTIGUOUS static slice):

    - ``A [B, 2chi, chi]`` rows ``(s alpha)`` s-major: ``A[u*chi+al, b] =
      a[al, u, b]`` (an XLA transpose of the site tensor, half a theta of
      traffic — the only materialized prep).
    - ``B [B, chi, 2chi]`` cols ``(t beta)`` t-major: a FREE reshape of the
      right site tensor ``b [chi, 2, chi]``.
    - ``theta0 = A @ B`` then has quadrant ``(u, v)`` at
      ``[u*chi:(u+1)*chi, v*chi:(v+1)*chi]``, and the gate application
      ``theta[(s al),(t be)] = sum_uv g[s,t,u,v] theta0[(u al),(v be)]``
      is 16 broadcast scalar-times-matrix FMAs (VPU) over static slices.
    - ``g [B, 4, 4]`` with ``g[2s+t, 2u+v]`` — exactly the engine's blended
      ``u4`` matrix (models/simulate.apply_schedule_op), so ALL two-site
      gate kinds (XX/SWAP/XXSW/ZZ) ride one kernel.

    Also writes ``tot[B] = ||theta||_F^2`` (broadcast over an 8-lane ref) —
    the downstream truncation mask needs the total squared weight and theta
    never exists in HBM on this path.
    """

    def kernel(ar_ref, ai_ref, br_ref, bi_ref, gr_ref, gi_ref,
               v0r_ref, v0i_ref,
               qr_ref, qi_ref, rr_ref, ri_ref, tot_ref,
               wr_ref, wi_ref, thr_ref, thi_ref, *v_scratch):
        Bb = ar_ref.shape[0]
        dn_ab = (((2,), (1,)), ((0,), (0,)))  # [B,2chi,chi] x [B,chi,2chi]
        t0r, t0i = _cmul_dot(ar_ref[:], ai_ref[:], br_ref[:], bi_ref[:], dn_ab)

        del Bb
        thr, thi = _gate_combine(t0r, t0i, gr_ref[:], gi_ref[:], chi)
        thr_ref[:] = thr
        thi_ref[:] = thi

        # ||theta||^2 leaves the kernel as a [Bb, 1, k] SUBLANE-partial
        # (lane sum finished in XLA by the batched wrapper): a full
        # (1, 2)-axis reduce — keepdims or not — materializes a [Bb, 1, 1]
        # value, which aborts the Mosaic layout pass on real lowering
        # (see _gate_combine). The sublane-only reduce keeps lanes native.
        tot_ref[:] = jnp.sum(thr * thr + thi * thi, axis=1, keepdims=True)

        _split_chain(iters, thr, thi, v0r_ref, v0i_ref,
                     qr_ref, qi_ref, rr_ref, ri_ref,
                     wr_ref, wi_ref, v_scratch, pair=pair)

    return kernel


def _batch_block(m: int, k: int, keep: int, iters: int) -> int:
    """Largest batch block fitting the buffer budget (Mosaic's scoped peak
    runs ~3x the block buffers; ceiling raised to 100 MB below). Counts
    ALL per-element block buffers: theta in, q/r out, w scratch, plus the
    iters>1 v scratch.

    The grid's blocks run SEQUENTIALLY on the core, and each block replays
    the full serial per-column orthonormalization chain — so a bigger
    block divides the op's total serial-latency share (the suspected
    small-chi bottleneck: ~512 dependent column steps per op at chi64
    under the 5 MB default). Block size groups independent batch elements
    only — it cannot change any element's numerics — so
    ``QMLTPU_FUSED_BLOCK_BYTES`` is a pure perf knob for the on-chip A/B
    (runs/perf_ab). Clamp semantics: pallas_qr.block_from_budget."""
    from qml_cutensornet_tpu.ops.pallas_qr import block_from_budget

    per = 4 * (2 * m * k + 2 * keep * m + 4 * keep * k)
    if iters > 1:
        per += 4 * 2 * keep * m
    return block_from_budget(per, "QMLTPU_FUSED_BLOCK_BYTES")


@lru_cache(maxsize=32)
def _build_call(Bb: int, n_blocks: int, m: int, k: int, keep: int, iters: int,
                interpret: bool, vma=None, pair: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    th_spec = pl.BlockSpec((Bb, m, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    v0_spec = pl.BlockSpec((m, keep), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((Bb, keep, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((Bb, keep, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    B = Bb * n_blocks
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    scratch = [
        pltpu.VMEM((Bb, keep, k), jnp.float32),
        pltpu.VMEM((Bb, keep, k), jnp.float32),
    ]
    if iters > 1:
        scratch += [
            pltpu.VMEM((Bb, keep, m), jnp.float32),
            pltpu.VMEM((Bb, keep, m), jnp.float32),
        ]
    return pl.pallas_call(
        _make_split_kernel(iters, pair),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((B, keep, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, k), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, k), jnp.float32, vma=vma),
        ),
        in_specs=[th_spec, th_spec, v0_spec, v0_spec],
        out_specs=(q_spec, q_spec, r_spec, r_spec),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )


def subspace_factor_batched(
    theta: Cpx, v0: Cpx, keep: int, iters: int = 1, interpret: bool = False,
    pair: bool | None = None,
) -> tuple[Cpx, Cpx]:
    """Fused subspace factorization of each ``theta[b] [m, k]``: returns
    ``(q [B, m, keep], r [B, keep, k])`` with ``q`` a masked isometry
    spanning (an approximation of) the top-``keep`` left singular subspace
    and ``r = q^H theta``. Zero columns of ``q`` are exactly zero."""
    B, m, k = theta.re.shape
    from qml_cutensornet_tpu.ops.pallas_qr import (
        match_vma, rebalance_block, vma_of)

    bb = rebalance_block(_batch_block(m, k, keep, iters), B)
    n_blocks = -(-B // bb)
    bpad = bb * n_blocks - B
    pad = lambda t: jnp.pad(t, ((0, bpad), (0, 0), (0, 0)))
    from qml_cutensornet_tpu.ops.pallas_qr import _resolve_pair

    vma = vma_of(theta.re)
    qr_, qi, rr, ri = _build_call(
        bb, n_blocks, m, k, keep, iters, interpret, vma, _resolve_pair(pair)
    )(pad(theta.re), pad(theta.im),
      match_vma(v0.re, vma), match_vma(v0.im, vma))
    q = Cpx(jnp.swapaxes(qr_[:B], 1, 2), jnp.swapaxes(qi[:B], 1, 2))
    return q, Cpx(rr[:B], ri[:B])


@lru_cache(maxsize=16)
def _get_split_single(iters: int, interpret: bool, pair: bool):
    """custom_vmap wrapper per (static) iters / interpret / pair choice."""

    @jax.custom_batching.custom_vmap
    def _split_single(thr, thi, v0r, v0i):
        q, r = subspace_factor_batched(
            Cpx(thr[None], thi[None]), Cpx(v0r, v0i), v0r.shape[1],
            iters=iters, interpret=interpret, pair=pair,
        )
        return q.re[0], q.im[0], r.re[0], r.im[0]

    @_split_single.def_vmap
    def _split_single_vmap(axis_size, in_batched, thr, thi, v0r, v0i):
        del axis_size
        if not (in_batched[0] and in_batched[1]):  # pragma: no cover
            raise NotImplementedError("fused split expects theta batched")
        # v0 is a shared constant start block; if a vmap batched it anyway,
        # slice one copy (all are identical by construction).
        if in_batched[2]:
            v0r = v0r[0]
        if in_batched[3]:
            v0i = v0i[0]
        q, r = subspace_factor_batched(
            Cpx(thr, thi), Cpx(v0r, v0i), v0r.shape[1],
            iters=iters, interpret=interpret, pair=pair,
        )
        return (q.re, q.im, r.re, r.im), (True, True, True, True)

    return _split_single


def subspace_factor(
    theta: Cpx, v0: Cpx, keep: int, iters: int = 1, interpret: bool = False,
    pair: bool | None = None,
) -> tuple[Cpx, Cpx]:
    """Drop-in for the matmul+orth chain in ops/svd._split_subspace (TPU
    f32, iters unrolled in-kernel; see _make_split_kernel for the iters>1
    semantics). Works under the engine's vmap level via a custom batching
    rule mapping the whole batch into one kernel launch."""
    from qml_cutensornet_tpu.ops.pallas_qr import _resolve_pair

    assert v0.re.shape[1] == keep
    fn = _get_split_single(iters, interpret, _resolve_pair(pair))
    qre, qim, rre, rim = fn(theta.re, theta.im, v0.re, v0.im)
    return Cpx(qre, qim), Cpx(rre, rim)


# --------------------------------------------------------------------------
# Phase 2: gate application + theta build fused into the same launch.
# --------------------------------------------------------------------------

# The ||theta||^2 output refs are [Bb, 1, k] SUBLANE-partials (lane sum
# finished in XLA): scalar-per-element in-kernel reduces create [Bb, 1, 1]
# values, which abort the Mosaic layout pass (see _gate_combine).


def gate_split_supported(
    chi: int, keep: int, dtype, iters: int = 1, interpret: bool = False
) -> bool:
    """Eligibility for the fused gate+theta-build split (phase 2): the
    phase-1 constraints at ``m = k = 2*chi``, plus ``chi`` a multiple of 8
    so the quadrant slices are sublane-aligned."""
    if chi % 8 != 0:
        return False
    return fused_split_supported(2 * chi, 2 * chi, keep, dtype, iters, interpret)


def _batch_block_gate(chi: int, keep: int, iters: int) -> int:
    """Batch block for the gate variant under the same
    ``QMLTPU_FUSED_BLOCK_BYTES`` budget (docs at :func:`_batch_block`).
    Per-element block buffers: A+B in (8 chi^2 f32 words), theta scratch
    (8 chi^2) plus the transient theta0 value (8 chi^2), q/r out and w
    scratch (2 keep * 2chi each), gate (32) — the theta0 value is counted
    like a buffer because Mosaic keeps it live across the gate combine."""
    from qml_cutensornet_tpu.ops.pallas_qr import block_from_budget

    m = k = 2 * chi
    per = 4 * (24 * chi * chi + 2 * keep * m + 4 * keep * k + 32 * chi)
    if iters > 1:
        per += 4 * 2 * keep * m
    return block_from_budget(per, "QMLTPU_FUSED_BLOCK_BYTES")


@lru_cache(maxsize=32)
def _build_gate_call(Bb: int, n_blocks: int, chi: int, keep: int, iters: int,
                     interpret: bool, vma=None, pair: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = k = 2 * chi
    a_spec = pl.BlockSpec((Bb, m, chi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((Bb, chi, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((Bb, 16, chi), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    v0_spec = pl.BlockSpec((m, keep), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((Bb, keep, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((Bb, keep, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((Bb, 1, k), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    B = Bb * n_blocks
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    scratch = [
        pltpu.VMEM((Bb, keep, k), jnp.float32),
        pltpu.VMEM((Bb, keep, k), jnp.float32),
        pltpu.VMEM((Bb, m, k), jnp.float32),
        pltpu.VMEM((Bb, m, k), jnp.float32),
    ]
    if iters > 1:
        scratch += [
            pltpu.VMEM((Bb, keep, m), jnp.float32),
            pltpu.VMEM((Bb, keep, m), jnp.float32),
        ]
    return pl.pallas_call(
        _make_gate_split_kernel(iters, chi, pair),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((B, keep, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, k), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, k), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, 1, k), jnp.float32, vma=vma),
        ),
        in_specs=[a_spec, a_spec, b_spec, b_spec, g_spec, g_spec,
                  v0_spec, v0_spec],
        out_specs=(q_spec, q_spec, r_spec, r_spec, t_spec),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )


def gate_split_factor_batched(
    A: Cpx, B: Cpx, g: Cpx, v0: Cpx, keep: int, iters: int = 1,
    interpret: bool = False, pair: bool | None = None,
) -> tuple[Cpx, Cpx, jnp.ndarray]:
    """Fused gate + theta build + subspace factorization. ``A [Bn, 2chi,
    chi]`` (s-major rows), ``B [Bn, chi, 2chi]`` (t-major cols), ``g [Bn,
    4, 4]`` the engine's blended two-site unitary. Returns ``(q [Bn, m,
    keep], r [Bn, keep, k], total [Bn])`` with ``total = ||theta||_F^2``."""
    Bn, m, chi = A.re.shape
    from qml_cutensornet_tpu.ops.pallas_qr import rebalance_block

    bb = rebalance_block(_batch_block_gate(chi, keep, iters), Bn)
    n_blocks = -(-Bn // bb)
    bpad = bb * n_blocks - Bn
    pad = lambda t: jnp.pad(t, ((0, bpad), (0, 0), (0, 0)))
    from qml_cutensornet_tpu.ops.pallas_qr import (
        _resolve_pair, match_vma, vma_of)

    # Gate rows [Bn, 16, chi]: coefficient (2s+t, 2u+v) replicated along
    # chi lanes so the in-kernel combine is a sublane broadcast — a
    # [B, 4, 4] gate ref aborts the Mosaic layout pass (_gate_combine).
    g16 = lambda t: jnp.broadcast_to(
        t.reshape(Bn, 16)[:, :, None], (Bn, 16, chi))
    vma = vma_of(A.re)
    qr_, qi, rr, ri, totp = _build_gate_call(
        bb, n_blocks, chi, keep, iters, interpret, vma, _resolve_pair(pair)
    )(pad(A.re), pad(A.im), pad(B.re), pad(B.im),
      pad(g16(g.re)), pad(g16(g.im)),
      match_vma(v0.re, vma), match_vma(v0.im, vma))
    q = Cpx(jnp.swapaxes(qr_[:Bn], 1, 2), jnp.swapaxes(qi[:Bn], 1, 2))
    # Lane-sum of the kernel's [Bn, 1, k] sublane-partial ||theta||^2.
    return q, Cpx(rr[:Bn], ri[:Bn]), jnp.sum(totp[:Bn, 0, :], axis=1)


@lru_cache(maxsize=16)
def _get_gate_split_single(iters: int, interpret: bool, pair: bool):
    """custom_vmap wrapper per (static) iters / interpret / pair choice."""

    @jax.custom_batching.custom_vmap
    def _gs_single(ar, ai, br, bi, gr, gi, v0r, v0i):
        q, r, tot = gate_split_factor_batched(
            Cpx(ar[None], ai[None]), Cpx(br[None], bi[None]),
            Cpx(gr[None], gi[None]), Cpx(v0r, v0i), v0r.shape[1],
            iters=iters, interpret=interpret, pair=pair,
        )
        return q.re[0], q.im[0], r.re[0], r.im[0], tot[0]

    @_gs_single.def_vmap
    def _gs_single_vmap(axis_size, in_batched, ar, ai, br, bi, gr, gi,
                        v0r, v0i):
        del axis_size
        if not all(in_batched[:6]):  # pragma: no cover
            raise NotImplementedError("gate split expects a, b, g batched")
        if in_batched[6]:
            v0r = v0r[0]
        if in_batched[7]:
            v0i = v0i[0]
        q, r, tot = gate_split_factor_batched(
            Cpx(ar, ai), Cpx(br, bi), Cpx(gr, gi), Cpx(v0r, v0i),
            v0r.shape[1], iters=iters, interpret=interpret, pair=pair,
        )
        return (q.re, q.im, r.re, r.im, tot), (True,) * 5

    return _gs_single


def gate_subspace_factor(
    A: Cpx, B: Cpx, g: Cpx, v0: Cpx, keep: int, iters: int = 1,
    interpret: bool = False, pair: bool | None = None,
) -> tuple[Cpx, Cpx, jnp.ndarray]:
    """Unbatched/vmap-level entry for the fused gate split (same custom
    batching contract as :func:`subspace_factor`)."""
    from qml_cutensornet_tpu.ops.pallas_qr import _resolve_pair

    assert v0.re.shape[1] == keep
    fn = _get_gate_split_single(iters, interpret, _resolve_pair(pair))
    qre, qim, rre, rim, tot = fn(A.re, A.im, B.re, B.im, g.re, g.im,
                                 v0.re, v0.im)
    return Cpx(qre, qim), Cpx(rre, rim), tot


# --------------------------------------------------------------------------
# Phase 2b: the BRICK (Vidal/Hastings) pair update fused end to end.
# --------------------------------------------------------------------------


def _gate_combine(t0r, t0i, gr, gi, chi):
    """Shared in-kernel 4x4 gate combine over contiguous quadrant slices
    of the raw two-site product t0 [B, 2chi, 2chi]. Used by BOTH the
    phase-2 gate kernel and the phase-2b brick kernel — one place to fix.

    ``gr, gi`` are the gate coefficients PRE-EXPANDED (in XLA, by the
    batched wrappers) to ``[B, 16, chi]`` rows: row ``4*(2s+t) + (2u+v)``
    holds ``g[2s+t, 2u+v]`` replicated along chi lanes. Each coefficient
    is then a ``[B, 1, chi]`` basic slice whose multiply against a
    ``[B, chi, chi]`` quadrant is a plain SUBLANE broadcast (lanes already
    match). This is load-bearing: any ``[B, 1, 1]``-shaped value in-kernel
    — a coefficient slice from a [B, 4, 4] ref, integer indexing, or a
    keepdims scalar reduce — aborts the Mosaic layout pass on REAL
    lowering (layout.h "arr.size() >= layout_rank" Check, measured on
    v5e) even though interpret mode and the lowering-only CI accept it.
    The ~8 KB/element of replicated-lane HBM traffic is noise next to the
    theta it saves."""
    outr = []
    outi = []
    for s in range(2):
        rowr = []
        rowi = []
        for t in range(2):
            accr = acci = None
            st = 2 * s + t
            for u in range(2):
                for v in range(2):
                    uv = 2 * u + v
                    ridx = 4 * st + uv
                    cr = gr[:, ridx:ridx + 1, :]  # [B, 1, chi]
                    ci = gi[:, ridx:ridx + 1, :]
                    qr_uv = t0r[:, u * chi:(u + 1) * chi, v * chi:(v + 1) * chi]
                    qi_uv = t0i[:, u * chi:(u + 1) * chi, v * chi:(v + 1) * chi]
                    pr = cr * qr_uv - ci * qi_uv
                    pi = cr * qi_uv + ci * qr_uv
                    accr = pr if accr is None else accr + pr
                    acci = pi if acci is None else acci + pi
            rowr.append(accr)
            rowi.append(acci)
        outr.append(jnp.concatenate(rowr, axis=2))
        outi.append(jnp.concatenate(rowi, axis=2))
    return jnp.concatenate(outr, axis=1), jnp.concatenate(outi, axis=1)


def _build_theta_quadrants(ar, ai, br, bi, gr, gi, chi):
    """Shared in-kernel theta construction: one batched complex matmul of
    the (s-major, t-major) site-tensor stacks plus the 4x4 gate combine
    (:func:`_gate_combine`). Returns theta VALUES [B, 2chi, 2chi]."""
    dn_ab = (((2,), (1,)), ((0,), (0,)))
    t0r, t0i = _cmul_dot(ar, ai, br, bi, dn_ab)
    return _gate_combine(t0r, t0i, gr, gi, chi)


def brick_split_supported(
    chi: int, keep: int, dtype, iters: int = 1, interpret: bool = False
) -> bool:
    """Eligibility for the fused brick pair-update kernel: same envelope as
    the phase-2 gate split (square [chi,2,chi] pair tensors only — the
    structural-caps rectangles stay on the XLA path)."""
    return gate_split_supported(chi, keep, dtype, iters, interpret)


def _batch_block_brick(chi: int, keep: int, iters: int) -> int:
    """Per-element block buffers: A+B in (8 chi^2 f32 words), theta_t and
    theta_w values (8 chi^2 each) plus the transient theta0 (8 chi^2),
    q/new_a0/w buffers (3 x 2*keep*2chi = 6 keep*m re+im) plus the pr/pi
    transient of the s2 row-norm pass (2 keep*m), lambda + gate (tiny).
    (Was 12 keep*m — a double count vs the gate variant's accounting that
    halved the default batch block, i.e. doubled the serial grid-step
    replay of the per-column orth chain for no VMEM reason.)"""
    from qml_cutensornet_tpu.ops.pallas_qr import block_from_budget

    m = 2 * chi
    per = 4 * (32 * chi * chi + 8 * keep * m + chi + 32 * chi)
    if iters > 1:
        per += 4 * 2 * keep * m
    return block_from_budget(per, "QMLTPU_FUSED_BLOCK_BYTES")


def _make_brick_split_kernel(iters: int, chi: int, pair: bool = False):
    """Fused Hastings pair update (ops/vidal.update_pairs semantics):

        theta_t = G (a x b)                 (gate-applied, UNWEIGHTED)
        theta_w = diag(lam_l twice) theta_t (the bond's Schmidt matrix)
        V       = top right-singular row basis of theta_w   (rows layout)
        new_a0  = theta_t V^H               (Hastings: no lambda inverse)

    The right-subspace chain is the phase-1 left chain with the dot roles
    swapped (theta^H's left subspace == theta's row space) — no in-kernel
    transposes. Outputs, per element: ``q2 [keep, k]`` (rows storage of the
    candidate basis Q; V = conj(Q rows)), ``na0 [keep, m]`` (rows storage of
    theta_t Q), ``s2 [keep]`` (squared singular values of theta_w per
    direction, = row norms^2 of Q^H theta_w^H), ``tot = ||theta_w||_F^2``.
    Masking/oversample-gather happen downstream (the ``fin`` closure in
    ops/svd.fused_brick_update) — they depend only on (s2, tot).
    """

    def kernel(ar_ref, ai_ref, br_ref, bi_ref, gr_ref, gi_ref, lam_ref,
               v0r_ref, v0i_ref,
               qr_ref, qi_ref, nar_ref, nai_ref, s2_ref, tot_ref,
               wr_ref, wi_ref, *v_scratch):
        Bb = ar_ref.shape[0]
        keep = qr_ref.shape[1]
        m = 2 * chi
        ttr, tti = _build_theta_quadrants(
            ar_ref[:], ai_ref[:], br_ref[:], bi_ref[:], gr_ref[:], gi_ref[:],
            chi,
        )
        # Row weight: row (s al) s-major -> lam[al] for both s halves.
        lam = lam_ref[:][:, 0, :]  # [Bb, 1, chi] ref -> [Bb, chi]
        lam2 = jnp.concatenate([lam, lam], axis=1)[:, :, None]  # [Bb, 2chi, 1]
        twr = ttr * lam2
        twi = tti * lam2

        # ||theta_w||^2 leaves as a [Bb, 1, k] SUBLANE-partial (lane sum
        # finished in XLA): scalar-per-element reduces create [Bb, 1, 1]
        # values, which abort the Mosaic layout pass (see _gate_combine).
        tot_ref[:] = jnp.sum(twr * twr + twi * twi, axis=1, keepdims=True)

        # Right-subspace chain on theta_w [B, m, k] (dot roles swapped
        # vs _split_chain; storage is rows == plain transposes, no conj).
        dn_rows_k = (((2,), (2,)), ((0,), (0,)))  # [B,keep,k] x [B,m,k] -> [B,keep,m]
        dn_m = (((2,), (1,)), ((0,), (0,)))       # [B,keep,m] x [B,m,k] -> [B,keep,k]

        qv = None  # q rows [B, keep, k] between iterations
        for it in range(iters):
            if it == 0:
                # Transpose the 2-D start block ONCE, then broadcast —
                # not the other way around (a batched swapaxes would move
                # Bb x the data for the same [keep, m] rows layout).
                v0r = jnp.broadcast_to(
                    jnp.swapaxes(v0r_ref[:], 0, 1)[None], (Bb, keep, m))
                v0i = jnp.broadcast_to(
                    jnp.swapaxes(v0i_ref[:], 0, 1)[None], (Bb, keep, m))
                # w_rows = (theta v0)^T: contract k -> [B, keep, m]
                wr, wi = _cmul_dot(v0r, v0i, twr, twi, dn_rows_k)
            else:
                # w_rows = (theta q_cols)^T: contract k -> [B, keep, m]
                wr, wi = _cmul_dot(qv[0], qv[1], twr, twi, dn_rows_k)
            orth_rows_body(wr, wi, wr_ref, wi_ref, pair=pair)

            # v_rows = (theta^H w)^T: contract m, conj theta -> [B, keep, k]
            vr_n, vi_n = _cmul_dot(wr_ref[:], wi_ref[:], twr, twi, dn_m,
                                   conj_b=True)
            if it == iters - 1:
                orth_rows_body(vr_n, vi_n, qr_ref, qi_ref, pair=pair)
            else:
                orth_rows_body(vr_n, vi_n, v_scratch[0], v_scratch[1], pair=pair)
                qv = (v_scratch[0][:], v_scratch[1][:])

        q2r = qr_ref[:]
        q2i = qi_ref[:]
        # s2[j] = sum_m |(theta_w q_cols)[m, j]|^2 (conj-invariant).
        pr, pi = _cmul_dot(q2r, q2i, twr, twi, dn_rows_k)
        s2_ref[:] = jnp.sum(pr * pr + pi * pi, axis=2)[:, None, :]
        # new_a0 rows = (theta_t q_cols)^T = theta_t V^H transposed storage.
        nar, nai = _cmul_dot(q2r, q2i, ttr, tti, dn_rows_k)
        nar_ref[:] = nar
        nai_ref[:] = nai

    return kernel


@lru_cache(maxsize=32)
def _build_brick_call(Bb: int, n_blocks: int, chi: int, keep: int, iters: int,
                      interpret: bool, vma=None, pair: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = k = 2 * chi
    a_spec = pl.BlockSpec((Bb, m, chi), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((Bb, chi, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((Bb, 16, chi), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    l_spec = pl.BlockSpec((Bb, 1, chi), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    v0_spec = pl.BlockSpec((m, keep), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((Bb, keep, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    na_spec = pl.BlockSpec((Bb, keep, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    s2_spec = pl.BlockSpec((Bb, 1, keep), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((Bb, 1, k), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    B = Bb * n_blocks
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    scratch = [
        pltpu.VMEM((Bb, keep, m), jnp.float32),
        pltpu.VMEM((Bb, keep, m), jnp.float32),
    ]
    if iters > 1:
        scratch += [
            pltpu.VMEM((Bb, keep, k), jnp.float32),
            pltpu.VMEM((Bb, keep, k), jnp.float32),
        ]
    return pl.pallas_call(
        _make_brick_split_kernel(iters, chi, pair),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((B, keep, k), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, k), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, keep, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, 1, keep), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, 1, k), jnp.float32, vma=vma),
        ),
        in_specs=[a_spec, a_spec, b_spec, b_spec, g_spec, g_spec, l_spec,
                  v0_spec, v0_spec],
        out_specs=(q_spec, q_spec, na_spec, na_spec, s2_spec, t_spec),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )


def brick_gate_split_batched(
    A: Cpx, B: Cpx, g: Cpx, lam, v0: Cpx, keep: int, iters: int = 1,
    interpret: bool = False, pair: bool | None = None,
):
    """Fused brick pair update over an explicit batch (no vmap wrapper —
    ops/vidal.update_pairs owns the flattened [B*K] batch). ``A [Bn, 2chi,
    chi]`` s-major, ``B [Bn, chi, 2chi]`` t-major, ``g [Bn, 4, 4]``,
    ``lam [Bn, chi]``. Returns ``(q2 [Bn, keep, k] rows, na0 [Bn, keep, m]
    rows, s2 [Bn, keep], total [Bn])``."""
    Bn, m, chi = A.re.shape
    from qml_cutensornet_tpu.ops.pallas_qr import rebalance_block

    bb = rebalance_block(_batch_block_brick(chi, keep, iters), Bn)
    n_blocks = -(-Bn // bb)
    bpad = bb * n_blocks - Bn
    pad3 = lambda t: jnp.pad(t, ((0, bpad), (0, 0), (0, 0)))
    pad2 = lambda t: jnp.pad(t, ((0, bpad), (0, 0)))
    from qml_cutensornet_tpu.ops.pallas_qr import (
        _resolve_pair, match_vma, vma_of)

    # Gate rows [Bn, 16, chi] (see gate_split_factor_batched).
    g16 = lambda t: jnp.broadcast_to(
        t.reshape(Bn, 16)[:, :, None], (Bn, 16, chi))
    vma = vma_of(A.re)
    q2r, q2i, nar, nai, s2, totp = _build_brick_call(
        bb, n_blocks, chi, keep, iters, interpret, vma, _resolve_pair(pair)
    )(pad3(A.re), pad3(A.im), pad3(B.re), pad3(B.im),
      pad3(g16(g.re)), pad3(g16(g.im)), pad2(lam)[:, None, :],
      match_vma(v0.re, vma), match_vma(v0.im, vma))
    return (Cpx(q2r[:Bn], q2i[:Bn]), Cpx(nar[:Bn], nai[:Bn]),
            s2[:Bn, 0], jnp.sum(totp[:Bn, 0, :], axis=1))
