"""Large-chi complex orthonormalization: blocked BCGS2 with CholeskyQR2
panels, in pure JAX (matmuls only).

Why this exists: the Pallas BCGS2 kernel (ops/pallas_qr.py) is VMEM-resident
— at chi >= ~256 its four [B, k, m] buffers no longer fit the ~128 MB of
VMEM even with batch blocking, and the XLA Householder fallback runs 2k
sequential panel steps (measured: dominant at every size, catastrophic at
large chi). This module expresses the SAME algorithm as streaming matmuls
that XLA tiles over HBM on its own, so it works at any size:

- Panels of P complex columns. Projection against all completed columns is
  two classical-Gram-Schmidt passes of batched ``[m, k] x [k, P]`` matmuls
  (unwritten columns of the Q buffer are exact zeros — projecting against
  the full buffer is a no-op for them, no masking needed; same trick as
  the Pallas kernel).
- WITHIN a panel: CholeskyQR2 — Gram matrix, Cholesky through the
  interleaved real embedding (complex chol == real chol of the embedding,
  ops/cpx.py embed_interleaved), triangular solve, twice. Matmul-only,
  so the panel step is MXU work too (the Pallas kernel instead runs a
  sequential per-column MGS2 loop, affordable only in VMEM).
- Panel conditioning: after the double projection the panel spans the
  dominant residual subspace, so its internal condition is set by the
  LOCAL singular-value ratio across <= P directions — not the full
  spectrum; that is what makes CholeskyQR safe here when it is unsafe
  globally (cpx.cholesky_qr docstring: global f32 CholeskyQR measurably
  loses weak directions).
- Numerically dependent columns are ZEROED where detectable: cross-panel
  dependents by the pre/post-projection norm ratio (_DEP_TOL, same rule as
  ops/pallas_qr.py), within-panel rank deficiency by the pass-1 output
  norm. Amplified-noise columns at the f32 detectability boundary can
  survive as unit-norm junk — the SAME contract as the Householder path's
  junk columns (cpx.qr docstring): their projection weights onto the input
  are at the noise floor, so the engine's sv-ratio mask (ops/svd.py)
  removes them, and they are orthogonal to all SIGNIFICANT directions to
  f32 scale (measured: real-real 2e-7, junk-real 2e-6, junk-junk up to
  1e-2 — the last is between two masked directions and harmless;
  tests/test_blocked_qr.py asserts exactly this contract).

Semantics match ``cpx.qr_orth`` up to unitary mixing within the span, which
no caller depends on (right factors are recomputed as Q^H theta).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.ops.cpx import Cpx

PANEL = 32  # complex columns per panel (matmul-friendly width)
_DEP_TOL = 1e-5  # residual-norm ratio below which a column is dependent


def _chol_qr_panel(a: Cpx, rdt, equilibrate: bool):
    """One CholeskyQR pass on a panel ``a [m, P]`` (complex pairs):
    Q = a L^{-H} with L = chol(a^H a + ridge I), computed in the
    interleaved real embedding (exactly the complex factorization,
    cpx.embed_interleaved docs).

    Pass 1 equilibrates columns to unit norm so the tiny ridge cannot
    pollute weak-but-real directions. Pass 2 MUST NOT re-equilibrate:
    after pass 1, numerically dependent columns come out with norm^2 ~
    ridge (the ridge dominates their null residual), and the final
    dependency test relies on them STAYING small — re-equilibrating would
    amplify them back to unit junk (cpx.cholesky_qr docstring has the same
    CholeskyQR2 convention). Exact-zero columns stay exactly zero.
    """
    from jax.scipy.linalg import solve_triangular

    from qml_cutensornet_tpu.ops import cpx

    p = a.re.shape[1]
    if equilibrate:
        n2 = jnp.sum(cpx.abs2(a), axis=0)
        inv = jnp.where(n2 > 0, lax.rsqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)
        a = cpx.scale(a, inv[None, :])
        ridge = jnp.asarray(1e-6 if rdt == jnp.float32 else 1e-14, rdt)
    else:
        # Pass 2's input is already near-orthonormal (dependents zeroed);
        # its only hazard is EXACT-zero columns, which any positive ridge
        # handles. A ridge at the 1e-6 scale would instead pollute pairs of
        # near-parallel marginal columns whose mutual residual^2 is
        # comparable to it (measured: 4.7e-3 orthogonality error on a
        # degenerate cluster at the f32 noise boundary; 1e-10 fixes it).
        ridge = jnp.asarray(1e-10 if rdt == jnp.float32 else 1e-20, rdt)
    g = cpx.einsum("mi,mj->ij", cpx.conj(a), a)
    g = Cpx(g.re + ridge * jnp.eye(p, dtype=rdt), g.im)
    ge = cpx.embed_interleaved(g)
    le = jnp.linalg.cholesky(ge)
    # Q = a L^{-H}: solve L Q^H = a^H in the embedding.
    ae = cpx.embed_interleaved(Cpx(a.re.T, -a.im.T))  # a^H [2P, 2m]
    qe = solve_triangular(le, ae, lower=True)
    qh = cpx.lift_interleaved(qe)
    return Cpx(qh.re.T, -qh.im.T)


def qr_orth_blocked(v: Cpx) -> Cpx:
    """Orthonormal basis of the columns of ``v [m, k]`` (complex pairs).
    Works under vmap (pure jnp ops). Zero input columns stay exactly zero;
    numerically dependent columns are zeroed."""
    from qml_cutensornet_tpu.ops import cpx

    m, k = v.re.shape
    rdt = v.re.dtype
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
            for _ in range(2):  # BCGS2: double projection pass
                c = cpx.einsum("mi,mp->ip", cpx.conj(q), a)
                a = cpx.sub(a, cpx.einsum("mi,ip->mp", q, c))
        # Dependency test BEFORE the chol passes (whose pass-1
        # equilibration would amplify dependent residuals back to unit
        # junk): a column whose residual after the double projection fell
        # below _DEP_TOL x its original norm is numerically in the span of
        # earlier columns — zeroed at the end (the Pallas kernel applies
        # the same rule, ops/pallas_qr.py _DEP_TOL2).
        n2_res = jnp.sum(cpx.abs2(a), axis=0)
        keep = (n2_res > (_DEP_TOL * _DEP_TOL) * n2_orig).astype(rdt)
        # CholeskyQR2 within the panel. After pass 1, within-panel
        # dependent columns (the panel's collective rank deficiency — not
        # necessarily aligned with any single input column) come out at
        # norm ~ sqrt(resid^2/ridge) << 1 while independents are ~unit;
        # zero them BEFORE pass 2, whose ridge would re-amplify anything
        # whose norm^2 is comparable to it back to O(1) junk.
        a = _chol_qr_panel(a, rdt, equilibrate=True)
        n2_1 = jnp.sum(cpx.abs2(a), axis=0)
        keep = keep * (n2_1 > 0.25).astype(rdt)
        a = cpx.scale(a, keep[None, :])
        a = _chol_qr_panel(a, rdt, equilibrate=False)
        # Safety projection against completed columns (cross-panel
        # orthogonality is set by the CGS passes; one more is cheap).
        if p0 > 0:
            c = cpx.einsum("mi,mp->ip", cpx.conj(q), a)
            a = cpx.sub(a, cpx.einsum("mi,ip->mp", q, c))
        n2 = jnp.sum(cpx.abs2(a), axis=0)
        keep = keep * (n2 > 0.5).astype(rdt)  # within-panel dependents
        inv = jnp.where(n2 > 0, lax.rsqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)
        a = cpx.scale(a, (keep * inv)[None, :])
        q_re = q_re.at[:, sl].set(a.re)
        q_im = q_im.at[:, sl].set(a.im)

    if pad:
        q_re = q_re[:, :k]
        q_im = q_im[:, :k]
    return Cpx(q_re, q_im)
