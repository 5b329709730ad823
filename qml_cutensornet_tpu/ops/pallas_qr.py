"""Pallas TPU kernel: batched COMPLEX column orthonormalization.

Why this kernel exists: the per-two-site-gate orthonormalization is ~83% of
MPS simulation wall-clock (measured round 2: the geqrf/orgqr custom calls
take 3.9 s of a 4.7 s 50-circuit batch at 32q chi=64). XLA's Householder QR
on the interleaved real embedding [2m, 2k] runs 2k sequential panel steps
through HBM-resident loops. This kernel instead runs blocked classical
Gram-Schmidt with reorthogonalization (BCGS2) directly in complex (re, im)
arithmetic, entirely VMEM-resident:

- COMPLEX columns: k sequential steps instead of the embedding's 2k (the
  J-invariance argument: orthonormalizing an embedded pair's second column
  is redundant, see cpx.embed_interleaved docs).
- Panels of P columns: projections against completed columns are batched
  ``lax.dot_general`` contractions (MXU); only the within-panel MGS2 loop
  is sequential vector work.
- Double pass everywhere (BCGS2 + local MGS2) keeps orthogonality at
  O(eps) like Householder, without CholeskyQR's condition-squaring — the
  failure mode that round 1 measured as a fidelity loss (cpx.cholesky_qr
  docstring).

Semantics match ``cpx.qr_orth`` up to a unitary mixing WITHIN the span
(any orthonormal basis of the column space is equally valid for the MPS
engine — truncation masks and right factors are recomputed from Q).
Exactly-zero input columns stay exactly zero (the padding invariant).

Replaces: the QR inside ops/svd._split_subspace and ops/mps.move_center
(reference hot op: cuTensorNet's per-gate SVD, gpu_backend/
kernel_state_ansatz.py:217-226).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.ops.cpx import Cpx

PANEL = 16  # complex columns per panel
_TINY = 1e-30  # norm^2 floor: exact-zero columns normalize to exact zero
# Dependent-column cutoff: a column whose residual norm^2 after the double
# projection falls below _DEP_TOL2 x (its ORIGINAL norm^2) is numerically in
# the span of earlier columns; it is ZEROED rather than normalized.
# Rationale: Gram-Schmidt (unlike Householder) turns rank-deficient noise
# residuals into CORRELATED junk columns (measured: orth err O(1), states
# destroyed); zeroing both restores orthonormality and strengthens the
# engine's exact-zero padding invariant. The f32 residual noise floor after
# the projection cascade is ~1e-6 relative, and directions that small carry
# squared singular weight < 1e-10 of the column — far below the truncation
# mask's own 2e-5 singular-value-ratio floor (ops/svd.py).
_DEP_TOL2 = 1e-10


def pallas_qr_supported(m: int, k: int, dtype) -> bool:
    """Kernel eligibility: TPU platform, f32, panel-aligned k, lane-friendly
    m. (f64 stays on the XLA Householder path — it is the CPU/parity mode.)"""
    import os

    if os.environ.get("QMLTPU_PALLAS_QR", "1") == "0":
        return False
    if dtype != jnp.float32:
        return False
    # Minimum m (= 2*chi) for kernel eligibility. 32 routes the staged-chi
    # RAMP-UP stages through the kernel too (measured round 2: 3.17 ->
    # 2.73 s on the 32q bench). Round 2 shipped 128 because the ramp-stage
    # numerics moved the bench parity number into a 1-2e-6 band — root-
    # caused in round 3 as the normalization-path diagonal artifact
    # (docs/PARITY.md), fixed in models/gram.py, so the fast default is
    # safe now.
    min_m = int(os.environ.get("QMLTPU_PALLAS_QR_MIN_M", "32"))
    if k % PANEL != 0 or m % 8 != 0 or m < min_m:
        return False
    # Upper gate: at k > 128 the VMEM-resident buffers stop fitting even
    # with batch blocking (chi=1024 needs 64 MB of block buffers alone,
    # ~170 MB scoped) and the UNROLLED panel/MGS loops blow up Mosaic
    # compile time. Large shapes route to the streaming blocked BCGS2 +
    # scanned-MGS2 path instead (ops/blocked_qr.py).
    if k > 128:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def mgs_pair() -> bool:
    """QMLTPU_MGS_PAIR=1 processes within-panel columns two at a time
    (block-2 BCGS2): the pair is CGS2-projected against the panel prefix
    in ONE dot_general (MXU) instead of two broadcast-reduce chains, then
    the second column is MGS2'd against the first. Halves the serial
    dependency chain that dominates per-op latency at chi >= 128
    (runs/perf_ab/profile_op.jsonl: orth1 21.8 ms/op at chi128 while the
    matmul work is ~2 ms). Default off pending the on-chip A/B.

    This is the ``pair=None`` call-time FALLBACK for direct ops-module
    users only. The engine threads ``SimConfig.mgs_pair`` explicitly (a
    static jit argument, like fused_split) — an env read at trace time
    inside a jitted caller would be baked into its jaxpr cache and go
    stale on in-process flips."""
    import os

    return os.environ.get("QMLTPU_MGS_PAIR", "0") == "1"


def _resolve_pair(pair: bool | None) -> bool:
    return mgs_pair() if pair is None else bool(pair)


def orth_rows_body(vr, vi, qr_ref, qi_ref, pair: bool = False):
    """BCGS2 over complex vectors stored as ROWS.

    ``vr, vi`` are VALUES ``[B, k, m]`` (k vectors of length m); the
    orthonormal rows are written into the VMEM refs ``qr_ref, qi_ref`` of
    the same shape. Shared by :func:`_orth_kernel` and the fused
    subspace-split kernel (ops/pallas_split.py), which calls it twice
    inside one launch. ``pair`` selects the block-2 within-panel variant
    (:func:`mgs_pair`); both variants produce an orthonormal basis of the
    same span with the same exact-zero and dependent-column-zeroing
    invariants — only the f32 summation order differs."""
    B, k, m = vr.shape
    nP = k // PANEL
    qr_ref[:] = jnp.zeros_like(qr_ref[:])
    qi_ref[:] = jnp.zeros_like(qi_ref[:])

    # dot_general dims: batch B; contract m (proj) or k (update).
    # precision=HIGHEST is load-bearing: TPU f32 matmuls default to
    # bfloat16 passes, which puts ~1e-3 into the projection coefficients
    # and destroys orthogonality (measured: orth_err 7e-4 -> 4e-7).
    dn_proj = (((2,), (2,)), ((0,), (0,)))  # [B,k,m] x [B,P,m] -> [B,k,P]
    dn_upd = (((1,), (1,)), ((0,), (0,)))  # [B,k,P] x [B,k,m] -> [B,P,m]
    f32 = jnp.float32

    for p in range(nP):
        sl = slice(p * PANEL, (p + 1) * PANEL)
        ar = vr[:, sl, :]
        ai = vi[:, sl, :]
        n2_orig = jnp.sum(ar * ar + ai * ai, axis=2)  # [B, P] pre-projection

        if p > 0:
            # Two CGS passes against ALL completed columns. Unwritten Q rows
            # are exact zeros, so projecting against the full buffer is a
            # no-op for them — no masking needed.
            for _ in range(2):
                Qr = qr_ref[:]
                Qi = qi_ref[:]
                cr = lax.dot_general(Qr, ar, dn_proj, preferred_element_type=f32, precision=lax.Precision.HIGHEST) + \
                     lax.dot_general(Qi, ai, dn_proj, preferred_element_type=f32, precision=lax.Precision.HIGHEST)
                ci = lax.dot_general(Qr, ai, dn_proj, preferred_element_type=f32, precision=lax.Precision.HIGHEST) - \
                     lax.dot_general(Qi, ar, dn_proj, preferred_element_type=f32, precision=lax.Precision.HIGHEST)
                ar = ar - (
                    lax.dot_general(cr, Qr, dn_upd, preferred_element_type=f32, precision=lax.Precision.HIGHEST)
                    - lax.dot_general(ci, Qi, dn_upd, preferred_element_type=f32, precision=lax.Precision.HIGHEST)
                )
                ai = ai - (
                    lax.dot_general(cr, Qi, dn_upd, preferred_element_type=f32, precision=lax.Precision.HIGHEST)
                    + lax.dot_general(ci, Qr, dn_upd, preferred_element_type=f32, precision=lax.Precision.HIGHEST)
                )

        if pair:
            # Block-2 within-panel BCGS2: the pair projects against the
            # panel prefix via dot_general (MXU, rows >= t are still exact
            # zeros so they contribute nothing), then column t+1 is MGS2'd
            # against the freshly normalized column t. Half the serial
            # steps of the scalar loop below; same span, same invariants.
            dn_p2 = (((2,), (2,)), ((0,), (0,)))  # [B,P,m] x [B,2,m] -> [B,P,2]
            dn_u2 = (((1,), (1,)), ((0,), (0,)))  # [B,P,2] x [B,P,m] -> [B,2,m]
            hi = lax.Precision.HIGHEST
            for t in range(0, PANEL, 2):
                xr = ar[:, t:t + 2, :]  # [B, 2, m]
                xi = ai[:, t:t + 2, :]
                for _ in range(2):
                    Qpr = qr_ref[:, sl, :]
                    Qpi = qi_ref[:, sl, :]
                    cr = lax.dot_general(Qpr, xr, dn_p2, preferred_element_type=f32, precision=hi) + \
                         lax.dot_general(Qpi, xi, dn_p2, preferred_element_type=f32, precision=hi)
                    ci = lax.dot_general(Qpr, xi, dn_p2, preferred_element_type=f32, precision=hi) - \
                         lax.dot_general(Qpi, xr, dn_p2, preferred_element_type=f32, precision=hi)
                    xr = xr - (
                        lax.dot_general(cr, Qpr, dn_u2, preferred_element_type=f32, precision=hi)
                        - lax.dot_general(ci, Qpi, dn_u2, preferred_element_type=f32, precision=hi)
                    )
                    xi = xi - (
                        lax.dot_general(cr, Qpi, dn_u2, preferred_element_type=f32, precision=hi)
                        + lax.dot_general(ci, Qpr, dn_u2, preferred_element_type=f32, precision=hi)
                    )
                x0r, x0i = xr[:, 0, :], xi[:, 0, :]
                n2 = jnp.sum(x0r * x0r + x0i * x0i, axis=1)
                keep = (n2 > _DEP_TOL2 * n2_orig[:, t]).astype(x0r.dtype)
                inv = lax.rsqrt(n2 + _TINY) * keep
                q0r = x0r * inv[:, None]
                q0i = x0i * inv[:, None]
                qr_ref[:, p * PANEL + t, :] = q0r
                qi_ref[:, p * PANEL + t, :] = q0i
                x1r, x1i = xr[:, 1, :], xi[:, 1, :]
                for _ in range(2):
                    cr1 = jnp.sum(q0r * x1r + q0i * x1i, axis=1)
                    ci1 = jnp.sum(q0r * x1i - q0i * x1r, axis=1)
                    x1r = x1r - (cr1[:, None] * q0r - ci1[:, None] * q0i)
                    x1i = x1i - (cr1[:, None] * q0i + ci1[:, None] * q0r)
                n2 = jnp.sum(x1r * x1r + x1i * x1i, axis=1)
                keep = (n2 > _DEP_TOL2 * n2_orig[:, t + 1]).astype(x1r.dtype)
                inv = lax.rsqrt(n2 + _TINY) * keep
                qr_ref[:, p * PANEL + t + 1, :] = x1r * inv[:, None]
                qi_ref[:, p * PANEL + t + 1, :] = x1i * inv[:, None]
            continue

        # Within-panel MGS2: sequential over the P columns, vector ops only.
        for t in range(PANEL):
            xr = ar[:, t, :]  # [B, m]
            xi = ai[:, t, :]
            for _ in range(2):
                Qpr = qr_ref[:, sl, :]  # prefix rows written, rest zero
                Qpi = qi_ref[:, sl, :]
                cr = jnp.sum(Qpr * xr[:, None, :] + Qpi * xi[:, None, :], axis=2)
                ci = jnp.sum(Qpr * xi[:, None, :] - Qpi * xr[:, None, :], axis=2)
                xr = xr - jnp.sum(
                    cr[:, :, None] * Qpr - ci[:, :, None] * Qpi, axis=1
                )
                xi = xi - jnp.sum(
                    cr[:, :, None] * Qpi + ci[:, :, None] * Qpr, axis=1
                )
            n2 = jnp.sum(xr * xr + xi * xi, axis=1)  # [B]
            keep = (n2 > _DEP_TOL2 * n2_orig[:, t]).astype(xr.dtype)
            inv = lax.rsqrt(n2 + _TINY) * keep
            qr_ref[:, p * PANEL + t, :] = xr * inv[:, None]
            qi_ref[:, p * PANEL + t, :] = xi * inv[:, None]


def _make_orth_kernel(pair: bool):
    """Standalone batched orthonormalization launch (inputs [B, k, m])."""

    def _orth_kernel(vr_ref, vi_ref, qr_ref, qi_ref):
        orth_rows_body(vr_ref[:], vi_ref[:], qr_ref, qi_ref, pair=pair)

    return _orth_kernel


def _make_orth_r_kernel(pair: bool):
    """Orthonormalization PLUS the R factor in one launch: r = q^H v,
    computed while q and v are both VMEM-resident (saves the separate XLA
    matmul dispatch + the q reload that cpx.qr otherwise pays per
    canonical-center move — 470 of 1092 ops in the 32q tracked stream)."""

    def _orth_r_kernel(vr_ref, vi_ref, qr_ref, qi_ref, rr_ref, ri_ref):
        vr = vr_ref[:]
        vi = vi_ref[:]
        orth_rows_body(vr, vi, qr_ref, qi_ref, pair=pair)
        # rows layout: r[i, j] = sum_m conj(q_rows[i, m]) v_rows[j, m]
        dn = (((2,), (2,)), ((0,), (0,)))
        hi = lax.Precision.HIGHEST
        f32 = jnp.float32
        qr_ = qr_ref[:]
        qi_ = qi_ref[:]
        rr_ref[:] = (
            lax.dot_general(qr_, vr, dn, preferred_element_type=f32, precision=hi)
            + lax.dot_general(qi_, vi, dn, preferred_element_type=f32, precision=hi)
        )
        ri_ref[:] = (
            lax.dot_general(qr_, vi, dn, preferred_element_type=f32, precision=hi)
            - lax.dot_general(qi_, vr, dn, preferred_element_type=f32, precision=hi)
        )

    return _orth_r_kernel


def block_from_budget(per_elem_bytes: int, env: str) -> int:
    """Largest EVEN batch block in [2, 128] whose per-element block buffers
    (``per_elem_bytes``, counted by the caller) fit the byte budget read
    from the ``env`` knob (default ~5 MB; accepts float syntax like 25e6).

    Shared by every Pallas launch's block sizing (the orthonormalizer and
    fused-split variants differ only in what they count per element).
    Mosaic's scoped peak runs ~3x the block buffers (measured: 9.4 MB of
    buffers OOMed at 25.5 MB scoped under the 16 MB compiler default; the
    launches raise the ceiling to 100 MB, so ~35 MB of buffers is the hard
    edge). Grid blocks run sequentially and each replays the serial
    per-column orthonormalization chain, so a bigger block divides an op's
    latency share; blocks group independent batch elements only — the knob
    is numerics-neutral, a pure perf lever for the on-chip A/B
    (runs/perf_ab). Minimum 2: Mosaic cannot lower the per-column
    reductions for 1-element batch vectors. The batch dim is neither lanes
    nor sublanes, so any block size is layout-legal."""
    import os

    # Default raised 5 MB -> 25 MB after the round-5 on-chip A/B at the
    # headline shape (runs/perf_ab/bench_blk25_chi64 vs bench: 2.21 s vs
    # 2.50, sim 1.87 -> 1.60 s, parity/fidelity byte-identical): at chi64
    # the 5 MB budget split B=100 into 4 grid blocks, replaying every
    # serial column chain 4x (profile_scan.jsonl — moves+splits are 65% of
    # sim). 25 MB of block buffers stays under the ~35 MB Mosaic scoped
    # edge documented above.
    budget = int(float(os.environ.get(env, str(25_000_000))))
    return max(2, min(128, (budget // per_elem_bytes // 2) * 2))


def _batch_block(k: int, m: int) -> int:
    """Block sizing for the plain orthonormalizer: four [Bb, k, m] f32
    in/out buffers per element (see :func:`block_from_budget`)."""
    return block_from_budget(4 * k * m * 4, "QMLTPU_QR_BLOCK_BYTES")


def vma_of(x):
    """Varying-manual-axes of a traced value, for pallas_call out_shapes.
    Inside ``shard_map`` (the site-sharded engine, parallel/sharded_mps.py)
    outputs must declare how they vary over the mesh axes; outside, None.
    Returned as a (hashable) frozenset so the lru-cached launch builders
    can key on it."""
    try:
        v = jax.typeof(x).vma
    except Exception:  # pragma: no cover - non-traced numpy input
        return None
    return v if v else None


def match_vma(x, vma):
    """Promote a replicated value (e.g. the fixed subspace start block) to
    the varying-manual-axes of the kernel's other inputs — inside
    shard_map, mixing replicated and varying operands is an error."""
    if not vma:
        return x
    return jax.lax.pcast(x, tuple(vma), to="varying")


def rebalance_block(bb: int, B: int) -> int:
    """Shrink a budget-sized block to the smallest even block that still
    covers ``B`` in the same number of grid steps — grid steps set the
    serial cost, so padding beyond ceil(B / n_blocks) is pure waste
    (e.g. a 76-block for B=100 pads 52 dead elements; a 50-block runs the
    same 2 steps)."""
    bb = min(bb, max(2, B))
    n_blocks = -(-B // bb)
    per_block = -(-B // n_blocks)  # ceil: smallest block covering B in n_blocks
    return max(2, -(-per_block // 2) * 2)  # round up to even


@lru_cache(maxsize=32)
def _build_call(Bb: int, n_blocks: int, k: int, m: int, interpret: bool,
                vma=None, pair: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((Bb, k, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        # The default scoped-vmem budget is 16 MB — a compiler default, not
        # the hardware (v5e has ~128 MB VMEM). Mosaic stacks the unrolled
        # panel loop's dot temporaries at ~3-5x the block buffers; raise
        # the ceiling so chi>=192 blocks compile.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        _make_orth_kernel(pair),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((Bb * n_blocks, k, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((Bb * n_blocks, k, m), jnp.float32, vma=vma),
        ),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
        **kwargs,
    )


@lru_cache(maxsize=32)
def _build_call_r(Bb: int, n_blocks: int, k: int, m: int, interpret: bool,
                  vma=None, pair: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((Bb, k, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((Bb, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    B = Bb * n_blocks
    return pl.pallas_call(
        _make_orth_r_kernel(pair),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((B, k, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, k, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, k, k), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, k, k), jnp.float32, vma=vma),
        ),
        in_specs=[spec, spec],
        out_specs=(spec, spec, r_spec, r_spec),
        interpret=interpret,
        **kwargs,
    )


def orthonormalize_r_batched(
    v: Cpx, interpret: bool = False, pair: bool | None = None
) -> tuple[Cpx, Cpx]:
    """Like :func:`orthonormalize_batched` but also returns ``r = q^H v``
    ([B, k, k], NOT triangular — the :func:`cpx.qr` contract) from the same
    launch."""
    B, m, k = v.re.shape
    # Budget must count the two extra [Bb, k, k] r-output blocks on top of
    # the four [Bb, k, m] in/out buffers _batch_block accounts for.
    bb_r = block_from_budget(4 * (4 * k * m + 2 * k * k),
                             "QMLTPU_QR_BLOCK_BYTES")
    bb = rebalance_block(min(bb_r, _batch_block(k, m)), B)
    n_blocks = -(-B // bb)
    bpad = bb * n_blocks - B
    tr = lambda t: jnp.pad(jnp.swapaxes(t, 1, 2), ((0, bpad), (0, 0), (0, 0)))
    qr_, qi, rr, ri = _build_call_r(
        bb, n_blocks, k, m, interpret, vma_of(v.re), _resolve_pair(pair)
    )(tr(v.re), tr(v.im))
    untr = lambda t: jnp.swapaxes(t[:B], 1, 2)
    return Cpx(untr(qr_), untr(qi)), Cpx(rr[:B], ri[:B])


@lru_cache(maxsize=8)
def _get_orth_r_single(interpret: bool, pair: bool):
    """custom_vmap wrapper for the fused Q+R launch, per (interpret, pair)
    (STATIC choices threaded from SimConfig.fused_interpret / .mgs_pair —
    not env reads, which nested-jit jaxpr caches would staleness-trap)."""

    @jax.custom_batching.custom_vmap
    def _orth_r_single(re, im):
        q, r = orthonormalize_r_batched(
            Cpx(re[None], im[None]), interpret=interpret, pair=pair)
        return q.re[0], q.im[0], r.re[0], r.im[0]

    @_orth_r_single.def_vmap
    def _orth_r_single_vmap(axis_size, in_batched, re, im):
        del axis_size
        if not all(in_batched):  # pragma: no cover - engine always batches both
            raise NotImplementedError(
                "orthonormalize expects re and im batched together"
            )
        q, r = orthonormalize_r_batched(Cpx(re, im), interpret=interpret,
                                        pair=pair)
        return (q.re, q.im, r.re, r.im), (True, True, True, True)

    return _orth_r_single


def qr_with_r_pallas(
    v: Cpx, interpret: bool = False, pair: bool | None = None
) -> tuple[Cpx, Cpx]:
    """Drop-in for the (q, r) pair in cpx.qr's Pallas branch: one launch
    instead of kernel + XLA matmul. Same vmap contract as qr_orth_pallas."""
    qre, qim, rre, rim = _get_orth_r_single(
        interpret, _resolve_pair(pair))(v.re, v.im)
    return Cpx(qre, qim), Cpx(rre, rim)


def orthonormalize_batched(
    v: Cpx, interpret: bool = False, pair: bool | None = None
) -> Cpx:
    """Orthonormal basis of the columns of each ``v[b] [m, k]`` (complex
    pairs, batched). Returns Q with the same shape; zero columns stay zero."""
    B, m, k = v.re.shape
    # Minimum block of 2: Mosaic cannot lower the per-column reductions for
    # 1-element batch vectors ("Unsupported output implicit dimension").
    bb = rebalance_block(_batch_block(k, m), B)
    n_blocks = -(-B // bb)
    bpad = bb * n_blocks - B
    tr = lambda t: jnp.pad(jnp.swapaxes(t, 1, 2), ((0, bpad), (0, 0), (0, 0)))
    qr_, qi = _build_call(bb, n_blocks, k, m, interpret, vma_of(v.re),
                          _resolve_pair(pair))(tr(v.re), tr(v.im))
    untr = lambda t: jnp.swapaxes(t[:B], 1, 2)
    return Cpx(untr(qr_), untr(qi))


@lru_cache(maxsize=8)
def _get_orth_single(interpret: bool, pair: bool):
    """custom_vmap wrapper per (interpret, pair) (static, threaded from
    SimConfig.fused_interpret / .mgs_pair — never an env read at trace
    time)."""

    @jax.custom_batching.custom_vmap
    def _orth_single(re, im):
        q = orthonormalize_batched(Cpx(re[None], im[None]),
                                   interpret=interpret, pair=pair)
        return q.re[0], q.im[0]

    @_orth_single.def_vmap
    def _orth_single_vmap(axis_size, in_batched, re, im):
        del axis_size
        if not all(in_batched):  # pragma: no cover - engine always batches both
            raise NotImplementedError(
                "orthonormalize expects re and im batched together"
            )
        q = orthonormalize_batched(Cpx(re, im), interpret=interpret, pair=pair)
        return (q.re, q.im), (True, True)

    return _orth_single


def qr_orth_pallas(
    v: Cpx, interpret: bool = False, pair: bool | None = None
) -> Cpx:
    """Drop-in for cpx.qr_orth on the TPU f32 path. Works under one level of
    vmap (the engine's batch axis) via a custom batching rule that maps the
    whole batch into ONE kernel launch instead of a serial grid."""
    re, im = _get_orth_single(interpret, _resolve_pair(pair))(v.re, v.im)
    return Cpx(re, im)
