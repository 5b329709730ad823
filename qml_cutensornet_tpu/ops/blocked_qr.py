"""Large-chi complex orthonormalization: blocked BCGS2 with scanned-MGS2
panels, in pure JAX.

Why this exists: the Pallas BCGS2 kernel (ops/pallas_qr.py) is VMEM-resident
— at chi >= ~256 its four [B, k, m] buffers no longer fit the ~128 MB of
VMEM even with batch blocking, and the XLA Householder fallback runs 2k
sequential panel steps through custom calls (measured: dominant at every
size, catastrophic at large chi). This module expresses the SAME algorithm
with XLA ops so it works at any size:

- Panels of P complex columns. Projection against all completed columns is
  two classical-Gram-Schmidt passes of batched ``[m, k] x [k, P]`` matmuls
  (the heavy work — MXU-shaped, streamed over HBM by XLA; unwritten
  columns of the Q buffer are exact zeros, so projecting against the full
  buffer is a no-op for them — same trick as the Pallas kernel).
- WITHIN a panel: the Pallas kernel's per-column MGS2 loop, as a
  ``lax.scan`` over the P columns (one-hot writes, like
  ops/svd._greedy_basis). Only P sequential steps of [m]-vector work per
  panel, inside the compiled program — nothing like the Householder custom
  call's per-column round trips.

  An earlier revision used CholeskyQR2 panels instead (matmul-only). That
  is NOT salvageable at f32: a rank-deficient panel of near-parallel
  columns has Gram lambda_max ~ P, and the f32 Cholesky's own rounding
  (~eps * P * ||G||) exceeds any ridge small enough not to damage weak
  directions -> negative pivot -> NaN factor (observed on TPU: NaNs
  propagate into the truncation mask, which then keeps NOTHING and zeroes
  whole states; CPU LAPACK merely happened to round the other way).
  MGS2 has no factorization to go NaN: every step is projections plus a
  guarded rsqrt.
- Numerically dependent columns are ZEROED, not normalized: a column whose
  residual after all projections falls below _DEP_TOL x its pre-projection
  norm is numerically in the span of earlier columns (ops/pallas_qr.py
  _DEP_TOL2 — the same rule and rationale). Amplified-noise columns at the
  f32 detectability boundary can survive as unit-norm junk — the SAME
  contract as the Householder path's junk columns (cpx.qr docstring):
  their projection weights onto the input are at the noise floor, so the
  engine's sv-ratio mask (ops/svd.py) removes them, and they are
  orthogonal to all SIGNIFICANT directions to f32 scale
  (tests/test_blocked_qr.py asserts exactly this contract).

Semantics match ``cpx.qr_orth`` up to unitary mixing within the span, which
no caller depends on (right factors are recomputed as Q^H theta).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.ops.cpx import Cpx

PANEL = 32  # complex columns per panel (matmul-friendly width)
_DEP_TOL = 1e-5  # residual-norm ratio below which a column is dependent
_TINY = 1e-30  # norm^2 floor: exact-zero columns normalize to exact zero


def _mgs2_panel(a: Cpx, n2_orig, rdt):
    """Orthonormalize one panel ``a [m, P]`` by modified Gram-Schmidt with
    reorthogonalization, scanned over columns. ``n2_orig [P]`` are the
    columns' PRE-projection squared norms (the dependency yardstick).
    Columns whose residual collapses below ``_DEP_TOL`` of their original
    norm are zeroed exactly."""
    from qml_cutensornet_tpu.ops import cpx

    m, p = a.re.shape
    # Carry init derived from the input so it inherits the varying-manual-
    # axes type under shard_map (see ops/svd._greedy_basis).
    one = a.re.reshape(-1)[0] * 0.0 + 1.0
    q0 = (jnp.zeros((m, p), rdt) * one, jnp.zeros((m, p), rdt) * one)

    def step(carry, inp):
        q_re, q_im, t = carry
        x_re, x_im, n2o = inp
        q = Cpx(q_re, q_im)
        x = Cpx(x_re, x_im)
        for _ in range(2):  # MGS2: double pass against the written prefix
            c = cpx.einsum("mi,m->i", cpx.conj(q), x)
            x = cpx.sub(x, cpx.einsum("mi,i->m", q, c))
        n2 = jnp.sum(cpx.abs2(x))
        keep = (n2 > (_DEP_TOL * _DEP_TOL) * n2o).astype(rdt)
        inv = lax.rsqrt(n2 + jnp.asarray(_TINY, rdt)) * keep
        onehot = (jnp.arange(p) == t).astype(rdt)
        q_re = q_re + (x.re * inv)[:, None] * onehot[None, :]
        q_im = q_im + (x.im * inv)[:, None] * onehot[None, :]
        return (q_re, q_im, t + 1), None

    (q_re, q_im, _), _ = lax.scan(
        step,
        (*q0, jnp.zeros((), jnp.int32) + (one.astype(jnp.int32) - 1)),
        (a.re.T, a.im.T, n2_orig.astype(rdt)),
    )
    return Cpx(q_re, q_im)


def _panel_kernel_ok(m: int, dtype, interpret: bool) -> bool:
    """Can the VMEM Pallas kernel orthonormalize a [m, PANEL] panel?
    Buffers are [Bb, PANEL, m] — tiny in the panel dimension, so this
    holds at ANY chi (m = 2*chi up to thousands of lanes)."""
    from qml_cutensornet_tpu.ops import pallas_qr

    if interpret:
        return dtype == jnp.float32 and m % 8 == 0
    return pallas_qr.pallas_qr_supported(m, PANEL, dtype)


def qr_orth_blocked(v: Cpx, pallas_panels: bool = False,
                    interpret: bool = False,
                    pair: bool | None = None) -> Cpx:
    """Orthonormal basis of the columns of ``v [m, k]`` (complex pairs).
    Works under vmap (pure jnp ops). Zero input columns stay exactly zero;
    numerically dependent columns are zeroed.

    ``pallas_panels=True`` (SimConfig.fused_split, threaded by callers —
    a static jit choice, not an env read) replaces the scanned-MGS2 panel
    with ONE VMEM kernel launch per panel (pallas_qr). The inter-panel
    BCGS2 matmuls — the FLOPs — are unchanged; what this removes is the
    k-step serial scan whose per-column vector ops round-trip HBM: the
    panel's 32 sequential steps run at VMEM latency instead. Same MGS2
    double-pass semantics and dependent-column zeroing (pallas_qr
    _DEP_TOL2 == _DEP_TOL**2, both on squared norms)."""
    from qml_cutensornet_tpu.ops import cpx

    m, k = v.re.shape
    rdt = v.re.dtype
    use_kernel = pallas_panels and _panel_kernel_ok(m, rdt, interpret)
    pad = (-k) % PANEL
    if pad:
        v = cpx.tmap(lambda t: jnp.pad(t, ((0, 0), (0, pad))), v)
    kp = k + pad
    q_re = jnp.zeros((m, kp), rdt)
    q_im = jnp.zeros((m, kp), rdt)

    for p0 in range(0, kp, PANEL):
        sl = slice(p0, p0 + PANEL)
        a = Cpx(v.re[:, sl], v.im[:, sl])
        n2_orig = jnp.sum(cpx.abs2(a), axis=0)  # pre-projection norms
        q = Cpx(q_re, q_im)
        if p0 > 0:
            for _ in range(2):  # BCGS2: double projection pass (matmuls)
                c = cpx.einsum("mi,mp->ip", cpx.conj(q), a)
                a = cpx.sub(a, cpx.einsum("mi,ip->mp", q, c))
        if use_kernel:
            from qml_cutensornet_tpu.ops import pallas_qr

            # The kernel's dependency yardstick is its INPUT norm (post-
            # BCGS2). A column that already collapsed against EARLIER
            # panels is an (often correlated) noise residual; it must be
            # zeroed BEFORE the kernel — if the kernel normalized it, the
            # panel's later columns would be orthogonalized against junk
            # (measured: span residuals ~0.05 on the rest of the panel).
            n2_post = jnp.sum(cpx.abs2(a), axis=0)
            cross_keep = (n2_post > (_DEP_TOL * _DEP_TOL) * n2_orig).astype(rdt)
            a = cpx.scale(a, cross_keep[None, :])
            a = pallas_qr.qr_orth_pallas(a, interpret=interpret, pair=pair)
        else:
            a = _mgs2_panel(a, n2_orig, rdt)
        q_re = q_re.at[:, sl].set(a.re)
        q_im = q_im.at[:, sl].set(a.im)

    if pad:
        q_re = q_re[:, :k]
        q_im = q_im[:, :k]
    return Cpx(q_re, q_im)
