"""Brick-parallel MPS evolution in Hastings B-form (parallel TEBD).

The sequential engine (ops/mps.py) applies one two-site update at a time at
a tracked canonical center — the op stream is inherently serial, and at
nq=100 a circuit is ~3700 sequential factorizations (reference hot loop:
one native ``simulate()`` call per circuit, gpu_backend/
kernel_state_ansatz.py:217-226). This module instead evolves the state in
the Vidal gauge, where a whole LAYER of disjoint two-site gates (a "brick")
updates simultaneously: one batched factorization over (batch x n/2 bonds)
per layer — 72 layers instead of 3744 ops at nq=100 d=6
(models/ansatz.py:_raw_brick).

Representation (Hastings' variant — no lambda inverses anywhere):

- ``tensors [B, n_p, chi, 2, chi]``: B-form site tensors ``B_i = Gamma_i
  lambda_i`` (right-canonical in the exact gauge). The plain product
  ``B_1 B_2 .. B_n`` IS the state, so downstream overlap code
  (models/simulate.py tile_overlaps_sq) consumes these tensors directly.
- ``lams [B, n_p-1, chi]``: bond Schmidt values (masked entries exact 0).
- Site axis is PADDED with dummy product sites (one left, 1-2 right) so
  both brick parities carry the same pair count with disjoint
  gathers/scatters (models/ansatz.py BrickRep docs).

Brick update across bond i (pair sites i, i+1), gate G:

    Theta~ = G (B_i B_{i+1})          -- NO left lambda
    Theta  = diag(lam_{i-1}) Theta~   -- the bond-i Schmidt matrix: the
             left environment A_1..A_{i-1} is column-isometric and the
             right environment B_{i+2}.. is row-isometric in the Vidal
             gauge, so Theta's singular values ARE the state's Schmidt
             spectrum across bond i; truncating them is globally optimal.
    V, s   = right factor / singular values of Theta (ops/svd.py
             truncated_split_right — masked truncation, both reference
             criteria)
    B_{i+1}' = V                       [Hastings: = Gamma'_{i+1} lam_{i+1}]
    B_i'     = Theta~ V^H              [= lam_{i-1}^{-1} U S, computed
                                        WITHOUT the inverse]
    lam_i'   = s

All pairs of one parity have disjoint inputs (the left lambda of pair
(2k, 2k+1) sits on an odd bond, untouched by the even brick), so the
whole brick is one ``[B*K]``-batched factorization — exactly the shape
the Pallas BCGS2 orthonormalizer (ops/pallas_qr.py) wants.

Like the sequential engine: no renormalization after truncation; the
kept-fraction product accumulates into ``fidelity`` (the reference's
``avg_fidelity`` stat); masked/padded entries are EXACT zeros.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.ops import cpx, gates
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops import svd as svd_mod
from qml_cutensornet_tpu.ops.svd import truncated_split_right


class VidalState(NamedTuple):
    """Batched brick-engine state (batch axis leading on every leaf)."""

    tensors: Cpx  # [B, n_p, chi, 2, chi]
    lams: jnp.ndarray  # [B, n_p-1, chi] real
    fidelity: jnp.ndarray  # [B]
    bond_dims: jnp.ndarray  # [B, n_p-1] int32


def zero_state(batch: int, n_p: int, cfg: SimConfig) -> VidalState:
    """|0..0> over the padded site space: every site e0 (x) |0> (x) e0,
    every bond lambda = e0 (a dim-1 bond with weight 1)."""
    rdt = cfg.real_dtype
    re = jnp.zeros((batch, n_p, cfg.chi, 2, cfg.chi), dtype=rdt)
    re = re.at[:, :, 0, 0, 0].set(1.0)
    lams = jnp.zeros((batch, n_p - 1, cfg.chi), dtype=rdt).at[:, :, 0].set(1.0)
    return VidalState(
        tensors=Cpx(re, jnp.zeros_like(re)),
        lams=lams,
        fidelity=jnp.ones((batch,), dtype=rdt),
        bond_dims=jnp.ones((batch, n_p - 1), dtype=jnp.int32),
    )


def apply_1q_real_sites(state: VidalState, u2: Cpx, n: int) -> VidalState:
    """Apply the same 1q gate to every REAL site (padded sites 1..n).
    1q unitaries act on B_i without touching lambdas."""
    t = state.tensors
    mid = cpx.tmap(lambda x: x[:, 1 : n + 1], t)
    mid = cpx.einsum("st,mnatc->mnasc", u2, mid)
    upd = lambda full, m: lax.dynamic_update_slice_in_dim(full, m, 1, axis=1)
    return state._replace(tensors=Cpx(upd(t.re, mid.re), upd(t.im, mid.im)))


def apply_diag_real_sites(state: VidalState, phases: Cpx) -> VidalState:
    """Per-REAL-site diagonal 1q gates, ``phases [B, n, 2]`` (the Rz
    feature-encoding layer). Dummy sites are left untouched."""
    t = state.tensors
    n = phases.re.shape[1]
    ph = cpx.tmap(lambda p: p[:, :, None, :, None], phases)
    mid = cpx.tmap(lambda x: x[:, 1 : n + 1], t)
    mid = cpx.mul(ph, mid)
    upd = lambda full, m: lax.dynamic_update_slice_in_dim(full, m, 1, axis=1)
    return state._replace(tensors=Cpx(upd(t.re, mid.re), upd(t.im, mid.im)))


def structural_caps(n: int, K: int, chi: int) -> list[tuple[int, int, int]]:
    """Static per-pair-index bond-cap triples ``(cl, cm, cr)`` for one brick
    layer over ``n`` real sites (padded convention: real sites 1..n, one
    leading dummy — module docstring).

    Bond ``j`` (between padded sites j, j+1) bipartitions the real chain
    into ``l = min(j, n)`` left / ``r = n - l`` right sites, so its Schmidt
    rank — hence the engine's kept rank, hence (by the exact-zero padding
    invariant) the extent of nonzero entries in the stored tensors — is at
    most ``min(2^l, 2^r)``. Pair ``k`` sits at middle bond ``parity + 2k``
    with parity traced in {0, 1} inside the layer scan, so each cap is the
    MAX over both parities: static per pair index, conservative, exact.
    Caps are rounded up to powers of two (fewer distinct chunk shapes to
    compile) and floored at 4 (dodge degenerate-kernel paths; the cost is
    negligible)."""

    def sb(j: int) -> int:
        l = min(max(j, 0), n)
        m = min(l, n - l)
        return chi if m >= 31 else min(chi, 1 << m)

    rnd = lambda c: min(chi, max(4, 1 << (c - 1).bit_length()))
    out = []
    for k in range(K):
        j0, j1 = 2 * k, 2 * k + 1  # middle bond at parity 0 / 1
        out.append((
            rnd(max(sb(j0 - 1), sb(j1 - 1))),
            rnd(max(sb(j0), sb(j1))),
            rnd(max(sb(j0 + 1), sb(j1 + 1))),
        ))
    return out


def _pair_chunk(K: int, chi: int, batch: int) -> int:
    """Pairs per sub-step within a brick layer. At large chi the layer's
    theta intermediates ([B, K, chi, 2, 2, chi] pairs of f32 arrays)
    dominate HBM — chunk pairs so one sub-step's live set stays ~1 GB-
    scale while each factorization is still MXU-saturating on its own.
    All chunks of a layer are disjoint site pairs, so sequential sub-steps
    are exact."""
    budget_elems = 1 << 27  # ~0.5G f32 elements across the chunk's thetas
    per_pair = 4 * chi * chi * 2 * max(batch, 1)  # theta elems/pair (re+im)
    kc = max(1, budget_elems // max(per_pair, 1))
    return min(K, kc)


def brick_layer(
    state: VidalState,
    parity,
    swap_w,
    active,
    thetas,
    cfg: SimConfig,
    n: int | None = None,
) -> VidalState:
    """One brick layer: simultaneous two-site updates on all pairs
    ``(parity + 2k, parity + 2k + 1)``, k in [0, K), processed in
    memory-bounded pair chunks (:func:`_pair_chunk`).

    ``parity`` traced scalar int32; ``swap_w`` traced scalar (1.0 = fused
    XXPhase@SWAP network step, 0.0 = plain XXPhase brick); ``active [K]``
    bool (shared across the batch — inactive pairs are exact no-ops via
    select); ``thetas [B, K]`` per-sample angles (0 on non-firing pairs).

    With ``cfg.brick_struct_caps`` and ``n`` (real site count) given, pair
    chunks additionally split at :func:`structural_caps` bucket boundaries
    and each chunk dispatches at its bucket's sliced shapes — exact, and
    skips the edge pairs' full-chi cubic work.
    """
    K = active.shape[0]
    chi = state.tensors.re.shape[2]
    batch = state.tensors.re.shape[0]
    if cfg.brick_struct_caps and n is not None:
        caps = structural_caps(n, K, chi)
        k0 = 0
        while k0 < K:
            c = caps[k0]
            k1 = k0 + 1
            while k1 < K and caps[k1] == c:
                k1 += 1
            kc = _pair_chunk(k1 - k0, max(c), batch)
            for s in range(k0, k1, kc):
                sl = slice(s, min(k1, s + kc))
                state = _brick_pairs(
                    state, parity, s, swap_w, active[sl], thetas[:, sl], cfg,
                    caps=c,
                )
            k0 = k1
        return state
    kc = _pair_chunk(K, chi, batch)
    for k0 in range(0, K, kc):
        sl = slice(k0, min(K, k0 + kc))
        state = _brick_pairs(
            state, parity, k0, swap_w, active[sl], thetas[:, sl], cfg
        )
    return state


def update_pairs(a: Cpx, b: Cpx, lam_l, thetas, swap_w, cfg: SimConfig):
    """Batched Hastings two-site updates on already-gathered pairs.

    ``a [B, K, cl, 2, cm]`` / ``b [B, K, cm, 2, cr]`` Cpx (left/right
    B-form site tensors of each pair — square ``cl = cm = cr = chi`` in the
    plain engine, rectangular structural-cap slices under
    ``cfg.brick_struct_caps``), ``lam_l`` [B, K, cl] (Schmidt weights on
    each pair's LEFT bond), ``thetas`` [B, K] XXPhase angles, ``swap_w``
    traced scalar (1.0 = fused XXPhase@SWAP network step, 0.0 = plain
    XXPhase). The updated middle bond keeps at most ``cm`` directions.

    Returns ``(new_a, new_b, s, kf, rank)`` with no active-pair select and
    no scatter — callers own gather/select/scatter (the whole-chain engine
    below gathers by padded site index; the site-sharded engine,
    parallel/sharded_mps.py, gathers from its local block + halo)."""
    B, K = a.re.shape[0], a.re.shape[1]
    cl, cm, cr = a.re.shape[2], a.re.shape[4], b.re.shape[4]
    rdt = cfg.real_dtype

    # theta~ = G (a b): gate built per (sample, pair). XXSW = XX with
    # columns 1,2 exchanged (models/simulate.py uses the same trick).
    xx = gates.xxphase(thetas, rdt)  # [B, K, 4, 4]
    perm = jnp.array([0, 2, 1, 3])
    fu = cpx.tmap(lambda m: m[..., :, perm], xx)
    g = Cpx(
        swap_w * fu.re + (1.0 - swap_w) * xx.re,
        swap_w * fu.im + (1.0 - swap_w) * xx.im,
    )

    if svd_mod.brick_split_eligible(cfg, cl, cm, cr):
        # Phase-2b fused path: theta build + gate + lambda weight + right
        # split + Hastings new_a all inside one Pallas launch per block —
        # the three theta-sized intermediates below never exist in HBM
        # (ops/pallas_split._make_brick_split_kernel).
        flat4 = lambda x: x.reshape(B * K, *x.shape[2:])
        new_a, new_b, s, kf, rank = svd_mod.fused_brick_update(
            cpx.tmap(flat4, a), cpx.tmap(flat4, b), cpx.tmap(flat4, g),
            flat4(lam_l), cfg, cm,
        )
        unflat = lambda x: x.reshape(B, K, *x.shape[1:])
        return (
            cpx.tmap(unflat, new_a),
            cpx.tmap(unflat, new_b),
            s.reshape(B, K, cm),
            kf.reshape(B, K),
            rank.reshape(B, K),
        )

    g = cpx.tmap(lambda m: m.reshape(B, K, 2, 2, 2, 2), g)
    theta0 = cpx.einsum("bkasc,bkctd->bkastd", a, b)
    theta_t = cpx.einsum("bkstuv,bkauvc->bkastc", g, theta0)  # gate applied

    # Weight by the left lambda -> the Schmidt matrix of bond idx.
    theta_w = cpx.tmap(lambda x: x * lam_l[:, :, :, None, None, None], theta_t)

    flat = lambda x: x.reshape(B * K, cl * 2, 2 * cr)
    th_w = cpx.tmap(flat, theta_w)
    th_t = cpx.tmap(flat, theta_t)

    v, s, kf, rank = jax.vmap(lambda m: truncated_split_right(m, cfg, cm))(th_w)
    # Hastings: new left tensor from the UNWEIGHTED theta (no lambda
    # inverse): B_i' = theta~ V^H.
    new_a = cpx.einsum("bmk,bck->bmc", th_t, cpx.conj(v))  # [B*K, cl*2, cm]

    new_a = cpx.tmap(lambda x: x.reshape(B, K, cl, 2, cm), new_a)
    new_b = cpx.tmap(lambda x: x.reshape(B, K, cm, 2, cr), v)
    return new_a, new_b, s.reshape(B, K, cm), kf.reshape(B, K), rank.reshape(B, K)


def _brick_pairs(
    state: VidalState,
    parity,
    k_off: int,
    swap_w,
    active,
    thetas,
    cfg: SimConfig,
    caps: tuple[int, int, int] | None = None,
) -> VidalState:
    """Update the pair-index range [k_off, k_off + len(active)) of one
    brick layer (see :func:`brick_layer`).

    ``caps = (cl, cm, cr)`` (structural bond caps of every pair in the
    range, :func:`structural_caps`) slices the gathered pair blocks before
    the update and zero-pads on writeback — exact for active AND inactive
    pairs, because stored entries beyond a bond's structural cap are exact
    zeros at all times (kept rank <= structural Schmidt bound)."""
    t = state.tensors
    K = active.shape[0]
    chi = t.re.shape[2]

    idx = parity + 2 * (k_off + jnp.arange(K, dtype=jnp.int32))  # left sites
    take_s = lambda x, i: jnp.take(x, i, axis=1)
    a = cpx.tmap(lambda x: take_s(x, idx), t)  # [B, K, chi, 2, chi]
    b = cpx.tmap(lambda x: take_s(x, idx + 1), t)
    lam_old = take_s(state.lams, idx)  # middle-bond weights (for inactive)
    # Left lambda of pair k sits on bond idx-1 (the opposite parity — never
    # written by this brick). idx==0 only occurs for the always-inactive
    # leading dummy pair; clip and let select discard it.
    lam_l = take_s(state.lams, jnp.maximum(idx - 1, 0))  # [B, K, chi]

    cl, cm, cr = (chi, chi, chi) if caps is None else caps
    if caps is not None:
        a = cpx.tmap(lambda x: x[:, :, :cl, :, :cm], a)
        b = cpx.tmap(lambda x: x[:, :, :cm, :, :cr], b)
        lam_l = lam_l[:, :, :cl]
        lam_old = lam_old[:, :, :cm]
    lam_l = jnp.where((idx > 0)[None, :, None], lam_l, lam_l * 0 + 1.0)

    new_a, new_b, s, kf, rank = update_pairs(a, b, lam_l, thetas, swap_w, cfg)

    # Inactive pairs: keep everything unchanged (exact no-op).
    am = active[None, :]
    sel5 = lambda new, old: jnp.where(am[:, :, None, None, None], new, old)
    new_a = Cpx(sel5(new_a.re, a.re), sel5(new_a.im, a.im))
    new_b = Cpx(sel5(new_b.re, b.re), sel5(new_b.im, b.im))
    lam_new = jnp.where(am[:, :, None], s, lam_old)
    rank_new = jnp.where(am, rank, take_s(state.bond_dims, idx))
    fid = state.fidelity * jnp.prod(jnp.where(am, kf, 1.0), axis=1).astype(
        state.fidelity.dtype
    )
    if caps is not None:  # zero-pad back to the stored [chi, 2, chi]
        pad_t = lambda x, l, r: jnp.pad(
            x, ((0, 0), (0, 0), (0, chi - l), (0, 0), (0, chi - r))
        )
        new_a = cpx.tmap(lambda x: pad_t(x, cl, cm), new_a)
        new_b = cpx.tmap(lambda x: pad_t(x, cm, cr), new_b)
        lam_new = jnp.pad(lam_new, ((0, 0), (0, 0), (0, chi - cm)))

    put = lambda full, i, val: full.at[:, i].set(val)
    tensors = Cpx(
        put(put(t.re, idx, new_a.re), idx + 1, new_b.re),
        put(put(t.im, idx, new_a.im), idx + 1, new_b.im),
    )
    lams = put(state.lams, idx, lam_new)
    bond_dims = put(state.bond_dims, idx, rank_new.astype(jnp.int32))
    return VidalState(tensors=tensors, lams=lams, fidelity=fid, bond_dims=bond_dims)


def layer_scan(
    state: VidalState, parities, swaps, actives, thetas, cfg: SimConfig,
    n: int | None = None,
):
    """Scan a chunk of layers: ``parities [C]``, ``swaps [C]`` (as floats),
    ``actives [C, K]``, ``thetas [C, B, K]``. ``n`` (real site count)
    enables per-pair structural caps under ``cfg.brick_struct_caps``."""

    def body(st, inp):
        par, sw, act, th = inp
        return brick_layer(st, par, sw, act, th, cfg, n=n), None

    state, _ = lax.scan(body, state, (parities, swaps, actives, thetas))
    return state


def to_mps_tensors(state: VidalState, n: int):
    """Strip the dummy sites: the B-form product over real sites is the
    state (dummy bonds are exact dim-1 e0 bonds, so slicing is exact).
    Returns (tensors [B, n, chi, 2, chi], fidelity [B], bond_dims
    [B, n-1])."""
    tensors = cpx.tmap(lambda x: x[:, 1 : n + 1], state.tensors)
    bond_dims = state.bond_dims[:, 1:n]
    return tensors, state.fidelity, bond_dims
