"""Complex arithmetic as explicit (re, im) real-array pairs.

The TPU backend in this environment does not implement complex dtypes at all
(every complex HLO fails UNIMPLEMENTED), and even where XLA supports complex
it lowers to real ops anyway. We therefore make the lowering explicit: a
complex tensor is a :class:`Cpx` pytree of two real arrays. This is also the
performant layout — each complex contraction becomes four real contractions
that tile directly onto the MXU, with no interleaved re/im strides.

Conventions: 4-multiplication product (not Karatsuba) for best rounding
behavior, since kernel-entry parity <= 1e-6 is a hard requirement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Cpx(NamedTuple):
    re: jnp.ndarray
    im: jnp.ndarray

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype


def from_np(arr, dtype=jnp.float32) -> Cpx:
    """Host-side constructor from a numpy (possibly complex) array."""
    arr = np.asarray(arr)
    return Cpx(
        jnp.asarray(np.real(arr), dtype=dtype), jnp.asarray(np.imag(arr), dtype=dtype)
    )


def to_np(x: Cpx) -> np.ndarray:
    """Host-side: materialize as a numpy complex array."""
    return np.asarray(x.re) + 1j * np.asarray(x.im)


def zeros(shape, dtype=jnp.float32) -> Cpx:
    return Cpx(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def conj(x: Cpx) -> Cpx:
    return Cpx(x.re, -x.im)


def add(x: Cpx, y: Cpx) -> Cpx:
    return Cpx(x.re + y.re, x.im + y.im)


def sub(x: Cpx, y: Cpx) -> Cpx:
    return Cpx(x.re - y.re, x.im - y.im)


def mul(x: Cpx, y: Cpx) -> Cpx:
    """Elementwise complex multiply (broadcasting)."""
    return Cpx(x.re * y.re - x.im * y.im, x.re * y.im + x.im * y.re)


def scale(x: Cpx, s) -> Cpx:
    """Multiply by a REAL scalar/array (broadcasting)."""
    return Cpx(x.re * s, x.im * s)


def abs2(x: Cpx):
    return x.re * x.re + x.im * x.im


def expi(theta, dtype=None) -> Cpx:
    """e^{i theta} for real theta."""
    re = jnp.cos(theta)
    im = jnp.sin(theta)
    if dtype is not None:
        re, im = re.astype(dtype), im.astype(dtype)
    return Cpx(re, im)


def einsum(spec: str, x: Cpx, y: Cpx) -> Cpx:
    """Complex einsum via four real einsums."""
    rr = jnp.einsum(spec, x.re, y.re)
    ii = jnp.einsum(spec, x.im, y.im)
    ri = jnp.einsum(spec, x.re, y.im)
    ir = jnp.einsum(spec, x.im, y.re)
    return Cpx(rr - ii, ri + ir)


def einsum_rc(spec: str, x_real, y: Cpx) -> Cpx:
    """einsum of a REAL tensor with a complex one."""
    return Cpx(jnp.einsum(spec, x_real, y.re), jnp.einsum(spec, x_real, y.im))


def matmul(x: Cpx, y: Cpx) -> Cpx:
    rr = x.re @ y.re
    ii = x.im @ y.im
    ri = x.re @ y.im
    ir = x.im @ y.re
    return Cpx(rr - ii, ri + ir)


def embed(m: Cpx) -> jnp.ndarray:
    """Real embedding E(M) = [[Re, -Im], [Im, Re]] of a complex matrix.

    E is a ring homomorphism: E(AB) = E(A)E(B), E(A^H) = E(A)^T, and E
    commutes with J = [[0, -I], [I, 0]] (multiplication by i). Consequently
    the real SVD of E(M) has every singular value of M twice, and every real
    singular triple (u, s, v) of E(M) maps EXACTLY to a complex triple
    (lift(u), s, lift(v)) of M — the basis of our complex-free SVD.
    """
    top = jnp.concatenate([m.re, -m.im], axis=-1)
    bot = jnp.concatenate([m.im, m.re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def lift(cols: jnp.ndarray) -> Cpx:
    """Inverse of the vector embedding: real [2k, ...] -> complex [k, ...]
    with x = top + i*bottom."""
    k = cols.shape[0] // 2
    return Cpx(cols[:k], cols[k:])


def stack(xs: list[Cpx], axis=0) -> Cpx:
    return Cpx(
        jnp.stack([x.re for x in xs], axis=axis),
        jnp.stack([x.im for x in xs], axis=axis),
    )


def tmap(fn, x: Cpx) -> Cpx:
    """Apply the same shape/indexing transform to both parts."""
    return Cpx(fn(x.re), fn(x.im))


def embed_interleaved(m: Cpx) -> jnp.ndarray:
    """INTERLEAVED real embedding: each complex entry becomes the 2x2 block
    [[re, -im], [im, re]], giving a real [2p, 2q] matrix.

    Unlike the block embedding (:func:`embed`), this one maps complex
    TRIANGULAR structure to real triangular structure (complex diagonal
    entries that are real map to scalar 2x2 blocks r*I). Consequence, by
    uniqueness of the Cholesky factorization: for Hermitian positive
    definite G, ``chol(embed_interleaved(G)) == embed_interleaved(chol(G))``
    EXACTLY — complex Cholesky (and triangular solves) reduce to real ones.
    """
    p, q = m.re.shape
    top = jnp.stack([m.re, -m.im], axis=-1)  # [p, q, 2]
    bot = jnp.stack([m.im, m.re], axis=-1)  # [p, q, 2]
    e = jnp.stack([top, bot], axis=1)  # [p, 2, q, 2]
    return e.reshape(2 * p, 2 * q)


def lift_interleaved(e: jnp.ndarray) -> Cpx:
    """Inverse of :func:`embed_interleaved` (reads the block structure)."""
    p, q = e.shape[0] // 2, e.shape[1] // 2
    er = e.reshape(p, 2, q, 2)
    return Cpx(er[:, 0, :, 0], er[:, 1, :, 0])


def _pallas_shape_ok(v: Cpx) -> bool:
    """Shape-only Pallas eligibility (no platform check) — used to honor
    SimConfig.fused_interpret on CPU CI."""
    from qml_cutensornet_tpu.ops import pallas_qr

    m, k = v.re.shape[-2], v.re.shape[-1]
    return (
        v.re.dtype == jnp.float32
        and k % pallas_qr.PANEL == 0
        and m % 8 == 0
        and k <= 128
    )


def _pallas_orth_eligible(v: Cpx) -> bool:
    from qml_cutensornet_tpu.ops import pallas_qr

    m, k = v.re.shape[-2], v.re.shape[-1]
    return pallas_qr.pallas_qr_supported(m, k, v.re.dtype)


def _blocked_orth_eligible(v: Cpx) -> bool:
    """Large-chi f32 TPU orthonormalization routes to the streaming blocked
    BCGS2 + scanned-MGS2 path (ops/blocked_qr.py): above the Pallas kernel's
    VMEM/unroll ceiling (k > 128), XLA Householder QR's sequential panel
    loop is the known catastrophic path on TPU. QMLTPU_BLOCKED_QR=0
    disables; =force enables on any platform/size (probing)."""
    import os

    mode = os.environ.get("QMLTPU_BLOCKED_QR", "1")
    if mode == "0":
        return False
    import jax.numpy as _jnp

    if v.re.dtype != _jnp.float32:
        return False
    if mode == "force":
        return True
    if v.re.shape[-1] <= 128:
        return False
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def qr(v: Cpx, fused: bool = False, interpret: bool = False,
       pair: bool | None = None) -> tuple[Cpx, Cpx]:
    """Complex reduced "QR": ``v = q @ r`` with ``q`` column-orthonormal.

    On the TPU f32 path this routes to the Pallas BCGS2 kernel
    (ops/pallas_qr.py — the XLA Householder custom call is 83% of MPS sim
    time) and recovers ``r = q^H v``; ``r`` is then NOT triangular, which no
    caller relies on (move_center only needs the exact product ``q r = v``).

    Otherwise: REAL Householder QR of the interleaved embedding. The
    positive-diagonal reduced QR is unique for full-rank input, and the
    canonical complex factors' embeddings ARE a real QR with positive
    diagonal — so after normalizing the real factor signs, lifting recovers
    the complex factors exactly. Backward-stable at any condition number
    (unlike CholeskyQR). Columns whose R diagonal collapses to ~0 (rank
    deficiency) lift to junk — but their R rows are ~0, so Q @ R still
    reproduces v to roundoff.
    """
    if fused and (_pallas_orth_eligible(v) or (interpret and _pallas_shape_ok(v))):
        # One launch for q AND r = q^H v (VMEM-resident; saves the matmul
        # dispatch + q reload per canonical-center move). ``fused_r`` /
        # ``interpret`` are threaded from SimConfig (static jit args),
        # never env reads at trace time (nested-jit caches would go stale).
        from qml_cutensornet_tpu.ops import pallas_qr

        return pallas_qr.qr_with_r_pallas(v, interpret=interpret, pair=pair)
    if _pallas_orth_eligible(v):
        from qml_cutensornet_tpu.ops import pallas_qr

        q = pallas_qr.qr_orth_pallas(v, pair=pair)
        r = einsum("mi,mk->ik", conj(q), v)
        return q, r
    if _blocked_orth_eligible(v):
        from qml_cutensornet_tpu.ops import blocked_qr

        q = blocked_qr.qr_orth_blocked(v, pallas_panels=fused,
                                       interpret=interpret, pair=pair)
        r = einsum("mi,mk->ik", conj(q), v)
        return q, r
    e = embed_interleaved(v)  # [2m, 2k]
    qe, re_ = jnp.linalg.qr(e)
    d = jnp.sign(jnp.diagonal(re_))
    d = jnp.where(d == 0, 1.0, d).astype(e.dtype)
    qe = qe * d[None, :]
    re_ = re_ * d[:, None]
    return lift_interleaved(qe), lift_interleaved(re_)


def qr_orth(v: Cpx, fused: bool = False, interpret: bool = False,
            pair: bool | None = None) -> Cpx:
    """Orthonormal basis of the columns of ``v`` (Q factor of :func:`qr`).
    ``fused``/``interpret``/``pair`` are SimConfig.fused_split /
    .fused_interpret / .mgs_pair threaded by callers (static jit choices):
    ``fused`` routes the large-chi blocked path's panels through the VMEM
    Pallas kernel; ``pair`` selects the block-2 within-panel BCGS2."""
    if _pallas_orth_eligible(v) or (interpret and _pallas_shape_ok(v)):
        from qml_cutensornet_tpu.ops import pallas_qr

        return pallas_qr.qr_orth_pallas(
            v, interpret=interpret and not _pallas_orth_eligible(v),
            pair=pair,
        )
    if _blocked_orth_eligible(v):
        from qml_cutensornet_tpu.ops import blocked_qr

        return blocked_qr.qr_orth_blocked(v, pallas_panels=fused,
                                          interpret=interpret, pair=pair)
    return qr(v)[0]


def cholesky_qr(v: Cpx, ridge: float | None = None, equilibrate: bool = True) -> Cpx:
    """EXPERIMENTAL — not on the production path. The engine's
    orthonormalizations (ops/svd.py subspace iteration, ops/mps.move_center)
    use Householder :func:`qr` instead: a ridged CholeskyQR at f32 measurably
    loses weak singular directions (bench fidelity 0.99910 vs 0.99993).
    Kept as the matmul-only candidate for a fused Pallas orthonormalization.

    Orthonormalize the columns of ``v [m, k]`` via CholeskyQR:
    G = v^H v, L = chol(G + ridge I), Q = v L^{-H} — all real linear algebra
    through the interleaved embedding (see :func:`embed_interleaved`).

    ``equilibrate`` scales columns to unit norm first so the ridge (relative
    to a unit diagonal) does not pollute weak-but-real directions — use it
    when column norms vary wildly (e.g. after a power-iteration multiply).
    For a SECOND pass on near-orthonormal input, call with
    ``equilibrate=False`` and the default tiny ridge: linearly dependent
    junk columns then stay SMALL (not renormalized) while being
    orthogonalized against the true directions, so they cannot double-count
    weight; downstream masking removes them (their projected weight is
    ~zero). CholeskyQR2 = equilibrated pass + raw pass.
    """
    from jax.scipy.linalg import solve_triangular

    rdt = v.re.dtype
    if ridge is None:
        if equilibrate:
            ridge = 1e-5 if rdt == jnp.float32 else 1e-14
        else:
            ridge = 1e-6 if rdt == jnp.float32 else 1e-14
    if equilibrate:
        norms = jnp.sqrt(jnp.sum(abs2(v), axis=0))
        floor = jnp.max(norms) * jnp.asarray(1e-30, rdt) + jnp.asarray(1e-37, rdt)
        d = 1.0 / jnp.maximum(norms, floor)
        v = scale(v, d[None, :])

    g = einsum("mi,mj->ij", conj(v), v)  # [k, k] Hermitian
    k = g.re.shape[0]
    g = Cpx(g.re + ridge * jnp.eye(k, dtype=rdt), g.im)
    ge = embed_interleaved(g)
    le = jnp.linalg.cholesky(ge)
    # Q = v L^{-H}:  L Q^H = v^H, solved in the embedding.
    ve = embed_interleaved(Cpx(v.re.T, -v.im.T))  # v^H as [2k, 2m]
    qe = solve_triangular(le, ve, lower=True)  # embed(Q^H)
    qh = lift_interleaved(qe)
    return Cpx(qh.re.T, -qh.im.T)
