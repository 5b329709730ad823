"""Truncated SVD of complex matrices using only REAL linear algebra.

The per-two-site-gate truncated SVD is the numerical heart of the MPS engine
(reference: cuTensorNet's internal SVD under ``Config(truncation_fidelity=...)``,
used at gpu_backend/kernel_state_ansatz.py:141-144, and ITensors' ``apply``
cutoff at KernelPkg/src/KernelPkg.jl:68).

TPU constraints shape the design:

- The TPU backend has no complex dtypes, so we decompose the real embedding
  ``E(M) = [[Re, -Im], [Im, Re]]``. ``E`` commutes with multiplication by i
  (``J = [[0,-I],[I,0]]``), so every singular value of M appears TWICE in
  ``E(M)``, and every real singular triple ``E(M) v = s u`` lifts EXACTLY to
  a complex relation ``M lift(v) = s lift(u)``.

- Lifted vectors from one doubled pair span the SAME complex direction, and
  within numerically coincident clusters the real basis is arbitrary, so a
  fixed "every other column" selection is wrong (it fails on exactly
  degenerate Schmidt spectra, which these circuits do produce — e.g. Bell
  pairs). Instead we select an orthonormal COMPLEX basis of the kept left
  singular subspace by a greedy Gram–Schmidt scan over the lifted candidates
  (descending singular value order). Any orthonormal basis of that subspace
  is equally valid: the right factor is recovered as ``Q^H theta``, making
  ``Q Q^H theta`` the optimal rank-``keep`` truncation without ever pairing
  left to right vectors.

- XLA requires static shapes, so truncation is a MASK over the selected
  columns: discarded ones are zeroed exactly. Zeroing matters — nonzero
  junk in dead columns would contract against stale padding in neighboring
  site tensors and corrupt later gates.

- ``svd_method="svd"`` runs ``jnp.linalg.svd`` on ``E(theta)``;
  ``svd_method="eigh"`` eigendecomposes ``E(theta) E(theta)^T`` (QDWH-eig on
  TPU is matmul-heavy/MXU-friendly but squares the condition number; fine
  for truncation decisions).
"""

from __future__ import annotations

import contextlib
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.cpx import Cpx

# A candidate direction is accepted if, after projecting out the directions
# already selected, at least this much of its (unit) norm-squared remains.
# Duplicated directions inside a degenerate cluster project to ~0; genuinely
# new directions retain O(1). Values in between only arise inside degenerate
# clusters, where any basis of the cluster subspace is equally correct.
_ACCEPT_TOL = 1e-4


def _truncation_mask(s, tail, total, cfg: SimConfig, keep: int):
    """Mask over the descending selected singular values ``s``.

    ``tail[i]`` is the trailing squared weight of the complex spectrum from
    rank ``i`` on, precomputed cancellation-free from the full descending
    real spectrum (eps=1e-16 sits BELOW f64 rounding, so any
    total-minus-cumsum formulation would put the comparison inside
    floating-point noise). ``total`` is the full squared weight.

    Keep index ``i`` iff (a) ``i < keep`` (bond cap), (b) above the
    ``value_of_zero`` floor, and (c) ``tail[i] > eps * total``. This is
    simultaneously cuTensorNet's ``truncation_fidelity = 1-eps`` rule and
    ITensors' relative ``cutoff = eps`` rule.
    """
    idx = jnp.arange(s.shape[0])
    mask = (idx < keep) & (tail[: s.shape[0]] > cfg.truncation_error * total)
    if cfg.value_of_zero > 0.0:
        mask = mask & (s > cfg.value_of_zero)
    mask = mask | (idx == 0)  # never drop everything
    kept = jnp.sum(jnp.where(mask, s * s, 0.0))
    kept_fraction = jnp.where(total > 0, kept / jnp.where(total > 0, total, 1.0), 1.0)
    kept_fraction = jnp.minimum(kept_fraction, 1.0)
    return mask, kept_fraction


def _greedy_basis(cand: Cpx, svs, keep: int):
    """Select an orthonormal complex basis from lifted candidates.

    ``cand [m, nc]`` are unit-norm complex candidates in descending
    singular-value order (each real triple of a doubled pair appears, so
    every complex direction is covered at least twice); ``svs [nc]`` their
    singular values. Returns (Q [m, keep] with zero columns past the
    selected rank, svq [keep] selected singular values).
    """
    m, nc = cand.re.shape
    rdt = cand.re.dtype
    # Derive the carry init from the input so it inherits the input's
    # varying-manual-axes type under shard_map (a constant init would make
    # the scan carry types mismatch inside the site-sharded engine).
    one = cand.re.reshape(-1)[0] * 0.0 + 1.0
    q0 = (jnp.zeros((m, keep), rdt) * one, jnp.zeros((m, keep), rdt) * one)
    carry0 = (
        *q0,
        jnp.zeros((keep,), rdt) * one,
        jnp.zeros((), jnp.int32) + (one.astype(jnp.int32) - 1),
    )

    def step(carry, inp):
        q_re, q_im, svq, r = carry
        c_re, c_im, s = inp
        q = Cpx(q_re, q_im)
        c = Cpx(c_re, c_im)
        coeff = cpx.einsum("ij,i->j", cpx.conj(q), c)  # [keep]
        proj = cpx.einsum("ij,j->i", q, coeff)
        cp = cpx.sub(c, proj)
        nrm2 = jnp.sum(cpx.abs2(cp))
        accept = (nrm2 > _ACCEPT_TOL) & (r < keep)
        inv = jnp.where(nrm2 > 0, lax.rsqrt(jnp.where(nrm2 > 0, nrm2, 1.0)), 0.0)
        cn = cpx.scale(cp, inv)
        onehot = ((jnp.arange(keep) == r) & accept).astype(rdt)
        q_re = q_re + cn.re[:, None] * onehot[None, :]
        q_im = q_im + cn.im[:, None] * onehot[None, :]
        svq = svq + s * onehot
        r = r + accept.astype(jnp.int32)
        return (q_re, q_im, svq, r), None

    (q_re, q_im, svq, _), _ = lax.scan(
        step, carry0, (cand.re.T, cand.im.T, svs.astype(rdt))
    )
    return Cpx(q_re, q_im), svq


def _tail_weights(p_desc):
    """Complex-spectrum trailing weights from the full descending REAL
    embedded spectrum ``p_desc`` (each complex sv appears twice):
    tail[i] = sum of complex p from complex rank i on = 0.5 * revcumsum
    of the real p, sampled at even real ranks. Cancellation-free."""
    rev = jnp.cumsum(p_desc[::-1])[::-1]
    tail = 0.5 * rev[0::2]
    total = 0.5 * jnp.sum(p_desc)
    return tail, total


@lru_cache(maxsize=64)
def _subspace_start(m: int, keep: int, dtype_name: str):
    """Fixed random start block for subspace iteration (deterministic; a
    fixed generic start almost surely overlaps every singular direction)."""
    rng = np.random.default_rng(0x5EED)
    re = rng.normal(size=(m, keep)).astype(dtype_name)
    im = rng.normal(size=(m, keep)).astype(dtype_name)
    return re, im


def _split_subspace(theta: Cpx, cfg: SimConfig, keep: int):
    """Matmul-only truncated factorization via subspace (power) iteration.

    QDWH-based SVD/eigh on TPU costs ~100x a matmul of the same size; this
    path replaces it with q iterations of V <- orth(H V), H = theta theta^H,
    orthonormalized by CholeskyQR through the interleaved real embedding.
    Any orthonormal basis Q of (an approximation of) the top left singular
    subspace yields an exact factorization theta ~= Q (Q^H theta); the
    truncation penalty of an imperfect subspace is bounded by the spectrum's
    flatness near the cut — exactly where optimal truncation is insensitive.
    When rank(theta) <= keep (the no-truncation regime, e.g. eps=1e-16 with
    adequate chi) the factorization is EXACT up to roundoff.

    Per-direction singular values are recovered as row norms of the right
    factor; the eps mask uses a sorted threshold so rows need not be
    reordered (bond basis order is unphysical).

    With ``cfg.oversample = p > 0`` the iteration runs with ``keep + p``
    basis columns and the top-``keep`` directions by captured weight are
    gathered out afterwards (randomized-SVD oversampling): the wider
    iterate pins down weak directions near the cut that a keep-width
    subspace can partially rotate away from, at ~(1 + p/keep) extra cost
    in this stage. The dropped p directions' weight lands in ``beyond``
    and is charged to the discarded fraction exactly like unseen spectrum.

    Returns (left, right, kept_fraction, rank) like :func:`truncated_svd`.
    """
    m, k = theta.re.shape
    rdt = theta.re.dtype

    nc = keep + max(0, cfg.oversample)
    v0re, v0im = _subspace_start(m, nc, np.dtype(rdt).name)
    v = Cpx(jnp.asarray(v0re), jnp.asarray(v0im))
    iters = max(1, cfg.subspace_iters)
    from qml_cutensornet_tpu.ops import pallas_split

    if cfg.power_precision == "inherit":
        power_ctx = contextlib.nullcontext
    else:
        # Reduced precision ONLY for the power multiplies; the basis is
        # re-orthonormalized and (r, s2) recomputed at ambient (full)
        # precision, so this perturbs only WHICH subspace is kept —
        # second-order in the truncation error (see SimConfig docs).
        power_ctx = lambda: jax.default_matmul_precision(cfg.power_precision)

    if (
        cfg.fused_split
        # The kernel's dots are pinned at HIGHEST; engaging it under a
        # lowered ambient/power precision would silently change the
        # numerics class mid-A/B, so it only replaces the full-precision
        # configuration.
        and cfg.matmul_precision in ("highest", "float32")
        and cfg.power_precision == "inherit"
        and pallas_split.fused_split_supported(
            m, k, nc, rdt, iters, interpret=cfg.fused_interpret
        )
    ):
        # One fused VMEM-resident launch for the whole chain (theta loaded
        # once; same BCGS2 body, HIGHEST-precision dots — see the module
        # docstring for the rounding-delta argument). Kernel and unfused
        # path below run the SAME inter-orth double-multiply iteration; the
        # kernel only changes memory residency and f32 summation order.
        q, r = pallas_split.subspace_factor(
            theta, v, nc, iters, interpret=cfg.fused_interpret,
            pair=cfg.mgs_pair,
        )
    else:
        # Inter-orthonormalized double-multiply form, every iteration:
        # w = orth(theta^H v); v = orth(theta w). Two skinny [m,k]x[k,nc]
        # products per iteration instead of forming theta theta^H once and
        # powering it. Orthonormalizing BETWEEN the two applications is
        # load-bearing at f32: the basis every orthonormalization sees is
        # conditioned ~s (theta's spectrum), not ~s^2, so weak-but-real
        # singular directions stay well above the roundoff floor. The
        # h-power loop this replaces squared the condition number per
        # multiply and measurably lost weak directions on chip at iters=2
        # (32q bench chi128: fidelity 0.99977 / parity 2.9e-6 vs this
        # form's 0.99996 / 2.9e-8 through the fused kernel, which has
        # always used the double-multiply form — runs/perf_ab). Same
        # subspace in exact arithmetic:
        # span((theta theta^H)^q v0) == span of this loop's iterate.
        for _ in range(iters):
            with power_ctx():
                w = cpx.einsum("ij,ik->jk", cpx.conj(theta), v)  # theta^H v
            w = cpx.qr_orth(w, fused=cfg.fused_split,
                            interpret=cfg.fused_interpret, pair=cfg.mgs_pair)
            with power_ctx():
                v = cpx.einsum("ij,jk->ik", theta, w)
            v = cpx.qr_orth(v, fused=cfg.fused_split,
                            interpret=cfg.fused_interpret, pair=cfg.mgs_pair)
        q = v
        r = cpx.einsum("mi,mk->ik", cpx.conj(q), theta)  # [keep, k]

    total = jnp.sum(cpx.abs2(theta))
    return _finish_subspace(q, r, total, cfg, keep, nc)


def _finish_subspace(q: Cpx, r: Cpx, total, cfg: SimConfig, keep: int, nc: int):
    """Shared tail of the subspace factorizations: recover squared singular
    values from the right factor's row norms, gather the top-``keep`` when
    oversampled, apply the truncation mask (sorted-threshold eps rule +
    sv-ratio floor + value_of_zero), and scale the factors. ``total`` is
    ``||theta||_F^2`` (computed in-kernel on the fused-gate path, where
    theta never exists in HBM)."""
    rdt = q.re.dtype
    s2 = jnp.sum(cpx.abs2(r), axis=1)  # squared sv per kept direction
    if nc > keep:
        # Oversampled: gather the top-keep directions by captured weight.
        # (argsort is stable; ties resolve by index, deterministically.)
        sel = jnp.argsort(-s2)[:keep]
        q = Cpx(q.re[:, sel], q.im[:, sel])
        r = Cpx(r.re[sel, :], r.im[sel, :])
        s2 = s2[sel]
    mask, kept_fraction = _mask_from_s2(s2, total, cfg, keep, rdt)

    mf = mask.astype(rdt)
    left = cpx.scale(q, mf[None, :])
    right = cpx.scale(r, mf[:, None])
    if cfg.renormalize:
        inv = lax.rsqrt(jnp.where(kept_fraction > 0, kept_fraction, 1.0))
        right = cpx.scale(right, inv.astype(rdt))
    rank = jnp.sum(mask.astype(jnp.int32))
    return left, right, kept_fraction, rank


def _mask_from_s2(s2, total, cfg: SimConfig, keep: int, rdt):
    """Truncation mask over the (post-gather) squared singular values
    ``s2 [keep]``: sorted-threshold eps rule with unseen weight charged via
    ``beyond = total - sum(s2)``, sv-ratio floor, value_of_zero floor.
    Returns ``(mask [keep] bool, kept_fraction)``."""
    beyond = jnp.maximum(total - jnp.sum(s2), 0.0)

    s2_sorted = jnp.sort(s2)[::-1]
    tail = jnp.cumsum(s2_sorted[::-1])[::-1] + beyond
    rule = tail > cfg.truncation_error * total  # keep sorted rank i
    n_keep = jnp.maximum(jnp.sum(rule.astype(jnp.int32)), 1)
    thresh = s2_sorted[jnp.minimum(n_keep - 1, keep - 1)]
    # Relative floor: CholeskyQR's ridge leaves junk directions with tiny
    # but nonzero weight; cut below the dtype's resolvable singular-value
    # ratio so rank/bond-dim stats reflect true ranks. (Components this
    # small are orders of magnitude below the kernel parity budget.)
    sv_ratio_floor = 2e-5 if rdt == jnp.float32 else 1e-10
    floor = s2_sorted[0] * (sv_ratio_floor * sv_ratio_floor)
    mask = (s2 >= jnp.maximum(thresh, 0.0)) & (s2 > floor)
    if cfg.value_of_zero > 0.0:
        mask = mask & (jnp.sqrt(s2) > cfg.value_of_zero)
    kept = jnp.sum(jnp.where(mask, s2, 0.0))
    kept_fraction = jnp.minimum(
        jnp.where(total > 0, kept / jnp.where(total > 0, total, 1.0), 1.0), 1.0
    )
    return mask, kept_fraction


def gate_split_eligible(cfg: SimConfig, chi: int) -> bool:
    """Static routing decision for the fused gate+theta-build split (phase
    2, ops/pallas_split). Mirrors the phase-1 gate in :func:`_split_subspace`
    (full-precision configs only — the kernel pins HIGHEST dots) plus the
    phase-2 shape constraints."""
    if cfg.svd_method != "subspace" or not (cfg.fused_split and cfg.fused_gate):
        return False
    if cfg.matmul_precision not in ("highest", "float32"):
        return False
    if cfg.power_precision != "inherit":
        return False
    from qml_cutensornet_tpu.ops import pallas_split

    nc = chi + max(0, cfg.oversample)
    return pallas_split.gate_split_supported(
        chi, nc, cfg.real_dtype, max(1, cfg.subspace_iters),
        interpret=cfg.fused_interpret,
    )


@partial(jax.jit, static_argnames=("cfg", "keep"))
def truncated_svd_gate(a: Cpx, b: Cpx, g: Cpx, cfg: SimConfig, keep: int,
                       is_left):
    """Fused two-site update factorization WITHOUT materializing theta:
    builds ``theta = gate . (a x b)`` inside the Pallas kernel and returns
    ``(left [2chi, keep], right [keep, 2chi], kept_fraction, rank)`` for
    ``theta`` (``is_left`` false) or ``theta^T`` (``is_left`` true — the
    DIR_L canonical-center placement, ops/mps.apply_2site).

    LAYOUT CONTRACT (differs from :func:`truncated_svd` on the row side):
    ``left`` rows are s-major — ``left[s*chi + al, :]`` is the (spin s,
    bond al) component — because the in-kernel quadrant construction needs
    contiguous spin blocks. ``right`` cols are t-major, same as the
    a-major path. For ``is_left`` the roles read t-major rows / s-major
    cols. Callers own the writeback reshapes (ops/mps.apply_2site).

    The transposed case never transposes theta itself: feeding the kernel
    ``A' = b^(t,be,b)-stack, B' = a^(b,u,al)-stack, g'[2t+s, 2v+u] =
    g[2s+t, 2u+v]`` makes it compute theta^T exactly (plain transpose, no
    conjugation — matching the unfused path's ``m.T``).
    """
    chi = a.re.shape[0]
    perm = jnp.array([0, 2, 1, 3])

    def make_n(a, b, g):
        A = cpx.tmap(lambda t: t.transpose(1, 0, 2).reshape(2 * chi, chi), a)
        B = cpx.tmap(lambda t: t.reshape(chi, 2 * chi), b)
        return A, B, g

    def make_t(a, b, g):
        A = cpx.tmap(lambda t: t.transpose(1, 2, 0).reshape(2 * chi, chi), b)
        B = cpx.tmap(lambda t: t.transpose(2, 1, 0).reshape(chi, 2 * chi), a)
        g2 = cpx.tmap(lambda t: t[perm][:, perm], g)
        return A, B, g2

    A, B, g2 = lax.cond(is_left, make_t, make_n, a, b, g)

    rdt = a.re.dtype
    nc = keep + max(0, cfg.oversample)
    v0re, v0im = _subspace_start(2 * chi, nc, np.dtype(rdt).name)
    v0 = Cpx(jnp.asarray(v0re), jnp.asarray(v0im))
    iters = max(1, cfg.subspace_iters)
    from qml_cutensornet_tpu.ops import pallas_split

    q, r, total = pallas_split.gate_subspace_factor(
        A, B, g2, v0, nc, iters, interpret=cfg.fused_interpret,
        pair=cfg.mgs_pair,
    )
    return _finish_subspace(q, r, total, cfg, keep, nc)


def brick_split_eligible(cfg: SimConfig, cl: int, cm: int, cr: int) -> bool:
    """Static routing decision for the fused brick pair update (phase 2b,
    ops/pallas_split._make_brick_split_kernel). Square pair tensors only
    (structural-caps rectangles stay on the XLA path); renormalize must be
    off (the engine default — truncated_split_right's own assumption)."""
    if cl != cm or cm != cr or cfg.renormalize:
        return False
    if cfg.svd_method != "subspace" or not (cfg.fused_split and cfg.fused_gate):
        return False
    if cfg.matmul_precision not in ("highest", "float32"):
        return False
    if cfg.power_precision != "inherit":
        return False
    from qml_cutensornet_tpu.ops import pallas_split

    nc = cm + max(0, cfg.oversample)
    return pallas_split.brick_split_supported(
        cm, nc, cfg.real_dtype, max(1, cfg.subspace_iters),
        interpret=cfg.fused_interpret,
    )


def fused_brick_update(a: Cpx, b: Cpx, g4: Cpx, lam, cfg: SimConfig,
                       keep: int):
    """Fused Hastings pair update (ops/vidal.update_pairs semantics) over a
    flat batch: ``a [Bn, chi, 2, chi]``, ``b [Bn, chi, 2, chi]``, ``g4
    [Bn, 4, 4]`` blended two-site unitaries, ``lam [Bn, chi]`` left-bond
    Schmidt weights. Builds theta, gate-applies, lambda-weights, extracts
    the top right-singular row basis V of the WEIGHTED theta and forms
    ``new_a = theta_t V^H`` — all inside one Pallas launch per batch block
    (theta never exists in HBM). Returns ``(new_a [Bn, chi, 2, keep],
    new_b [Bn, keep, 2, chi], s [Bn, keep], kept_fraction [Bn],
    rank [Bn])`` matching the XLA path's contract exactly."""
    Bn, chi = a.re.shape[0], a.re.shape[1]
    rdt = a.re.dtype
    A = cpx.tmap(lambda t: t.transpose(0, 2, 1, 3).reshape(Bn, 2 * chi, chi), a)
    Bm = cpx.tmap(lambda t: t.reshape(Bn, chi, 2 * chi), b)

    nc = keep + max(0, cfg.oversample)
    v0re, v0im = _subspace_start(2 * chi, nc, np.dtype(rdt).name)
    v0 = Cpx(jnp.asarray(v0re), jnp.asarray(v0im))
    iters = max(1, cfg.subspace_iters)
    from qml_cutensornet_tpu.ops import pallas_split

    q2, na0, s2, total = pallas_split.brick_gate_split_batched(
        A, Bm, g4, lam, v0, nc, iters, interpret=cfg.fused_interpret,
        pair=cfg.mgs_pair,
    )

    def fin(q2re, q2im, nare, naim, s2e, tote):
        if nc > keep:
            sel = jnp.argsort(-s2e)[:keep]
            q2re, q2im = q2re[sel], q2im[sel]
            nare, naim = nare[sel], naim[sel]
            s2e = s2e[sel]
        mask, kf = _mask_from_s2(s2e, tote, cfg, keep, rdt)
        mf = mask.astype(rdt)[:, None]
        # V = conj(Q rows); mask rows of V == mask columns of new_a.
        vre, vim = q2re * mf, -q2im * mf
        nare, naim = nare * mf, naim * mf
        s = jnp.sqrt(s2e) * mask.astype(rdt)
        return vre, vim, nare, naim, s, kf, jnp.sum(mask.astype(jnp.int32))

    vre, vim, nare, naim, s, kf, rank = jax.vmap(fin)(
        q2.re, q2.im, na0.re, na0.im, s2, total
    )
    # na0 rows [keep, (s al)] are new_a's columns: -> [chi(al), 2(s), keep].
    new_a = Cpx(
        nare.reshape(Bn, keep, 2, chi).transpose(0, 3, 2, 1),
        naim.reshape(Bn, keep, 2, chi).transpose(0, 3, 2, 1),
    )
    # V rows [keep, (t be)] t-major -> new_b [keep, 2, chi].
    new_b = Cpx(vre.reshape(Bn, keep, 2, chi), vim.reshape(Bn, keep, 2, chi))
    return new_a, new_b, s, kf, rank


def _left_vectors_svd(theta: Cpx, ncand: int):
    e = cpx.embed(theta)  # [2m, 2k]
    u, s, _ = jnp.linalg.svd(e, full_matrices=False)
    tail, total = _tail_weights(s * s)
    return cpx.lift(u[:, :ncand]), s[:ncand], tail, total


def _left_vectors_eigh(theta: Cpx, ncand: int):
    e = cpx.embed(theta)
    g = e @ e.T  # [2m, 2m] real symmetric PSD
    w, vecs = jnp.linalg.eigh(g)  # ascending
    w = jnp.clip(w[::-1], 0.0, None)
    vecs = vecs[:, ::-1]
    s = jnp.sqrt(w)
    tail, total = _tail_weights(w)
    return cpx.lift(vecs[:, :ncand]), s[:ncand], tail, total


@partial(jax.jit, static_argnames=("cfg", "keep"))
def truncated_split_right(theta: Cpx, cfg: SimConfig, keep: int):
    """Right-sided truncated factorization: ``theta [m, k]`` ≈
    ``(theta V^H) V`` with ``V [keep, k]`` ROW-orthonormal (masked rows
    exactly zero).

    Returns ``(V, s, kept_fraction, rank)`` where ``s [keep]`` are the kept
    singular values (``||theta v_j||`` per kept row, zeros on masked rows)
    — the new bond Schmidt weights for the Vidal/Hastings brick engine
    (ops/vidal.py). Implemented as the left-sided factorization of
    ``theta^H``: any orthonormal basis Q of theta^H's kept left singular
    subspace gives ``V = Q^H``, and ``theta V^H V`` is the corresponding
    truncation of theta. Assumes ``cfg.renormalize`` is False (the engine
    default, matching both reference backends) so the right factor's row
    norms ARE the singular values."""
    th = Cpx(jnp.swapaxes(theta.re, -1, -2), -jnp.swapaxes(theta.im, -1, -2))
    left, right, kept_fraction, rank = truncated_svd(th, cfg, keep)
    v = Cpx(jnp.swapaxes(left.re, -1, -2), -jnp.swapaxes(left.im, -1, -2))
    s = jnp.sqrt(jnp.sum(cpx.abs2(right), axis=-1))
    return v, s, kept_fraction, rank


@partial(jax.jit, static_argnames=("cfg", "keep"))
def truncated_svd(theta: Cpx, cfg: SimConfig, keep: int):
    """Factor ``theta [m, k]`` ≈ ``left [m, keep] @ right [keep, k]`` (complex
    Cpx pairs), with ``left`` a (masked) isometry spanning the kept left
    singular subspace and ``right = left^H theta``.

    Returns (left, right, kept_fraction, rank).
    """
    if cfg.svd_method == "subspace":
        return _split_subspace(theta, cfg, keep)
    m, k = theta.re.shape
    ncand = min(2 * keep, 2 * min(m, k))
    if cfg.svd_method == "eigh":
        cand, svs, tail, total = _left_vectors_eigh(theta, ncand)
    else:
        cand, svs, tail, total = _left_vectors_svd(theta, ncand)

    q, svq = _greedy_basis(cand, svs, keep)
    mask, kept_fraction = _truncation_mask(svq, tail, total, cfg, keep)

    mf = mask.astype(q.re.dtype)
    left = cpx.scale(q, mf[None, :])
    right = cpx.einsum("ij,ik->jk", cpx.conj(left), theta)  # [keep, k]
    if cfg.renormalize:
        inv = lax.rsqrt(jnp.where(kept_fraction > 0, kept_fraction, 1.0))
        right = cpx.scale(right, inv.astype(right.re.dtype))
    rank = jnp.sum((mask & (svq > 0)).astype(jnp.int32))
    return left, right, kept_fraction, rank
