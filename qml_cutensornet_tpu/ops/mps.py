"""Matrix Product State engine with static shapes and real-pair arithmetic.

This replaces the reference's two native MPS engines — pytket-cutensornet's
``MPSxGate`` (gate-by-gate evolution with per-two-site-gate truncated SVD,
gpu_backend/kernel_state_ansatz.py:213-231) and ITensors.jl's ``apply``
(KernelPkg/src/KernelPkg.jl:45-72) — with a pure-JAX design built for XLA:

- An MPS over ``n`` qubits is a :class:`~qml_cutensornet_tpu.ops.cpx.Cpx`
  pair of arrays ``[n, chi, 2, chi]`` (site, left bond, physical, right
  bond), padded to a static bond cap ``chi``. Truncated/padded entries are
  EXACTLY zero, so contractions over the padded dimensions equal the true
  contractions.
- All operations are functional and jit/vmap-friendly: no Python-level
  branching on data, no dynamic shapes. ``vmap`` over a batch of states
  turns every per-gate SVD into a batched SVD, which is how the TPU earns
  its keep versus the reference's one-circuit-at-a-time native calls.
- Like both reference engines we do NOT renormalize after truncation; we
  track the accumulated truncation fidelity (the reference reports it as
  ``avg_fidelity``, gpu_backend/kernel_state_ansatz.py:296-308).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.ops import svd
from qml_cutensornet_tpu.ops.svd import truncated_svd


class MPS(NamedTuple):
    """A padded MPS. ``bond_dims[i]`` is the true dimension of the bond
    between sites ``i`` and ``i+1`` (the analog of cuTensorNet's
    ``get_virtual_dimensions``, gpu_backend/kernel_state_ansatz.py:223)."""

    tensors: Cpx  # [n, chi, 2, chi]
    fidelity: jnp.ndarray  # [] real — product of per-gate kept fractions
    bond_dims: jnp.ndarray  # [n-1] int32


def zero_state(n: int, cfg: SimConfig) -> MPS:
    """|0...0> as a product state: every site tensor is e_0 ⊗ |0> ⊗ e_0."""
    if n < 2:
        raise ValueError("MPS needs at least 2 sites.")
    re = jnp.zeros((n, cfg.chi, 2, cfg.chi), dtype=cfg.real_dtype)
    re = re.at[:, 0, 0, 0].set(1.0)
    return MPS(
        tensors=Cpx(re, jnp.zeros_like(re)),
        fidelity=jnp.ones((), dtype=cfg.real_dtype),
        bond_dims=jnp.ones((n - 1,), dtype=jnp.int32),
    )


def apply_1q_all(mps: MPS, u2: Cpx) -> MPS:
    """Apply the same 1-qubit gate to every site (e.g. the Hadamard init
    layer, gpu_backend/kernel_state_ansatz.py:53-55). No SVD needed: 1q
    gates never change bond dimensions."""
    t = cpx.einsum("st,natb->nasb", u2, mps.tensors)
    return mps._replace(tensors=t)


def apply_diag_all(mps: MPS, phases: Cpx) -> MPS:
    """Apply per-site DIAGONAL 1-qubit gates given as ``phases [n, 2]``
    (the Rz feature-encoding layer, gpu_backend/kernel_state_ansatz.py:58-60).
    A pure elementwise multiply."""
    ph = cpx.tmap(lambda p: p[:, None, :, None], phases)
    return mps._replace(tensors=cpx.mul(ph, mps.tensors))


def apply_1q(mps: MPS, site, u2: Cpx) -> MPS:
    """Apply a 1-qubit gate at a (possibly traced) site index."""
    a = cpx.tmap(lambda t: lax.dynamic_slice_in_dim(t, site, 1, axis=0)[0], mps.tensors)
    a = cpx.einsum("st,atb->asb", u2, a)
    t = Cpx(
        lax.dynamic_update_slice_in_dim(mps.tensors.re, a.re[None], site, axis=0),
        lax.dynamic_update_slice_in_dim(mps.tensors.im, a.im[None], site, axis=0),
    )
    return mps._replace(tensors=t)


def apply_2site(mps: MPS, site, u4: Cpx, cfg: SimConfig, direction=None) -> MPS:
    """Apply a 2-qubit gate on adjacent sites ``(site, site+1)``:
    contract the two site tensors into theta, apply the gate, split back
    with a truncated SVD. This is the MPSxGate per-gate update
    (the reference's hot native op).

    ``direction`` places the orthogonality center after the split:
    None or DIR_R (0) -> center at ``site+1`` (left factor isometric);
    DIR_L (1) -> center at ``site`` (right factor row-isometric). The left
    placement is the SAME decomposition applied to theta^T (plain
    transpose): if theta^T ≈ L R with L col-isometric then
    theta ≈ R^T L^T with L^T row-isometric — one SVD serves both branches.
    """
    chi = cfg.chi
    pair = cpx.tmap(lambda t: lax.dynamic_slice_in_dim(t, site, 2, axis=0), mps.tensors)
    a = cpx.tmap(lambda t: t[0], pair)
    b = cpx.tmap(lambda t: t[1], pair)

    if svd.gate_split_eligible(cfg, chi):
        # Phase-2 fused path: theta is built and gate-applied INSIDE the
        # Pallas kernel (never materialized in HBM). Layout contract:
        # left rows s-major, right cols t-major (svd.truncated_svd_gate).
        is_left = (
            jnp.asarray(direction == 1)
            if direction is not None
            else jnp.asarray(False)
        )
        left, right, kept_fraction, rank = svd.truncated_svd_gate(
            a, b, u4, cfg, chi, is_left
        )

        def wb_n(left, right):
            # left [(s al), keep] -> new_a [al, s, keep]
            na = cpx.tmap(
                lambda t: t.reshape(2, chi, chi).transpose(1, 0, 2), left
            )
            nb = cpx.tmap(lambda t: t.reshape(chi, 2, chi), right)
            return na, nb

        def wb_t(left, right):
            # theta^T factors: left [(t be), keep], right [keep, (s al)].
            # new_a = right^T reshaped; new_b = left^T reshaped.
            na = cpx.tmap(
                lambda t: t.reshape(chi, 2, chi).transpose(2, 1, 0), right
            )
            nb = cpx.tmap(lambda t: t.reshape(2, chi, chi).transpose(2, 0, 1), left)
            return na, nb

        new_a, new_b = lax.cond(is_left, wb_t, wb_n, left, right)
        upd = cpx.stack([new_a, new_b], axis=0)
        tensors = Cpx(
            lax.dynamic_update_slice_in_dim(mps.tensors.re, upd.re, site, axis=0),
            lax.dynamic_update_slice_in_dim(mps.tensors.im, upd.im, site, axis=0),
        )
        fidelity = mps.fidelity * kept_fraction.astype(mps.fidelity.dtype)
        bond_dims = lax.dynamic_update_slice_in_dim(
            mps.bond_dims, rank[None].astype(jnp.int32), site, axis=0
        )
        return MPS(tensors=tensors, fidelity=fidelity, bond_dims=bond_dims)

    theta = cpx.einsum("asb,btc->astc", a, b)  # [chi, 2, 2, chi]
    g = cpx.tmap(lambda t: t.reshape(2, 2, 2, 2), u4)
    theta = cpx.einsum("stuv,auvc->astc", g, theta)
    m = cpx.tmap(lambda t: t.reshape(chi * 2, 2 * chi), theta)

    if direction is None:
        left, right, kept_fraction, rank = truncated_svd(m, cfg, keep=chi)
        new_a = cpx.tmap(lambda t: t.reshape(chi, 2, chi), left)
        new_b = cpx.tmap(lambda t: t.reshape(chi, 2, chi), right)
    else:
        is_left = direction == 1  # ansatz.DIR_L
        transpose = lambda c: cpx.tmap(lambda t: t.T, c)
        m2 = lax.cond(is_left, transpose, lambda c: c, m)
        fl, fr, kept_fraction, rank = truncated_svd(m2, cfg, keep=chi)
        new_a, new_b = lax.cond(
            is_left,
            lambda l, r: (transpose(r), transpose(l)),
            lambda l, r: (l, r),
            fl,
            fr,
        )
        new_a = cpx.tmap(lambda t: t.reshape(chi, 2, chi), new_a)
        new_b = cpx.tmap(lambda t: t.reshape(chi, 2, chi), new_b)
    upd = cpx.stack([new_a, new_b], axis=0)
    tensors = Cpx(
        lax.dynamic_update_slice_in_dim(mps.tensors.re, upd.re, site, axis=0),
        lax.dynamic_update_slice_in_dim(mps.tensors.im, upd.im, site, axis=0),
    )
    fidelity = mps.fidelity * kept_fraction.astype(mps.fidelity.dtype)
    bond_dims = lax.dynamic_update_slice_in_dim(
        mps.bond_dims, rank[None].astype(jnp.int32), site, axis=0
    )
    return MPS(tensors=tensors, fidelity=fidelity, bond_dims=bond_dims)


def move_center(mps: MPS, site, direction, cfg: SimConfig) -> MPS:
    """Move the orthogonality center across bond ``(site, site+1)`` with a
    single-site Householder QR (cpx.qr, through the interleaved real
    embedding) — exact (no truncation possible: ranks are
    unchanged) and far cheaper than a two-site update. ``direction == 0``
    (DIR_R) leaves the center at ``site+1``; ``direction == 1`` (DIR_L) at
    ``site``. A move in the direction the center already sits is an exact
    no-op (used as chunk padding)."""
    chi = cfg.chi
    pair = cpx.tmap(lambda t: lax.dynamic_slice_in_dim(t, site, 2, axis=0), mps.tensors)
    a = cpx.tmap(lambda t: t[0], pair)
    b = cpx.tmap(lambda t: t[1], pair)

    fused = cfg.fused_split
    interp = cfg.fused_interpret
    mpair = cfg.mgs_pair

    def right(a, b):
        t = cpx.tmap(lambda x: x.reshape(chi * 2, chi), a)
        q, r = cpx.qr(t, fused=fused, interpret=interp, pair=mpair)
        new_a = cpx.tmap(lambda x: x.reshape(chi, 2, chi), q)
        new_b = cpx.einsum("ij,jsc->isc", r, b)
        return new_a, new_b

    def left(a, b):
        t = cpx.tmap(lambda x: x.reshape(chi, 2 * chi), b)
        th = Cpx(t.re.T, -t.im.T)  # t^H [2chi, chi]
        q, r = cpx.qr(th, fused=fused, interpret=interp, pair=mpair)  # t^H = q r
        l = Cpx(r.re.T, -r.im.T)  # [chi, chi]
        qrow = Cpx(q.re.T, -q.im.T)  # row-orthonormal [chi, 2chi]
        new_b = cpx.tmap(lambda x: x.reshape(chi, 2, chi), qrow)
        new_a = cpx.einsum("asb,bj->asj", a, l)
        return new_a, new_b

    new_a, new_b = lax.cond(direction == 1, left, right, a, b)
    upd = cpx.stack([new_a, new_b], axis=0)
    tensors = Cpx(
        lax.dynamic_update_slice_in_dim(mps.tensors.re, upd.re, site, axis=0),
        lax.dynamic_update_slice_in_dim(mps.tensors.im, upd.im, site, axis=0),
    )
    return mps._replace(tensors=tensors)


def vdot(a: MPS, b: MPS) -> Cpx:
    """<a|b> via transfer-matrix contraction, scanned over sites.

    Matches ``mps.vdot`` (gpu:380) / ITensors ``inner`` (KernelPkg.jl:106).
    Each step is two chi-by-chi matmul groups — MXU work when batched.
    Returns a scalar Cpx.
    """
    chi = a.tensors.re.shape[1]
    m0 = Cpx(
        jnp.zeros((chi, chi), dtype=a.tensors.re.dtype).at[0, 0].set(1.0),
        jnp.zeros((chi, chi), dtype=a.tensors.re.dtype),
    )

    def step(m, ts):
        ta_re, ta_im, tb_re, tb_im = ts
        ta, tb = Cpx(ta_re, ta_im), Cpx(tb_re, tb_im)
        t = cpx.einsum("ab,bsd->asd", m, tb)
        m2 = cpx.einsum("asc,asd->cd", cpx.conj(ta), t)
        return m2, None

    m, _ = lax.scan(
        step, m0, (a.tensors.re, a.tensors.im, b.tensors.re, b.tensors.im)
    )
    return cpx.tmap(lambda t: t[0, 0], m)


def norm_sq(a: MPS):
    return vdot(a, a).re


def max_bond(mps: MPS):
    """Max virtual bond dimension — the reference's per-circuit chi stat
    (gpu_backend/kernel_state_ansatz.py:223, KernelPkg.jl:70)."""
    return jnp.max(mps.bond_dims)


def actual_nbytes(mps: MPS, itemsize: int):
    """Memory footprint of the UNPADDED MPS, matching the reference's
    ``sum(t.nbytes for t in mps.tensors)`` stat (gpu:295) as closely as a
    padded representation allows."""
    left = jnp.concatenate([jnp.ones((1,), jnp.int32), mps.bond_dims])
    right = jnp.concatenate([mps.bond_dims, jnp.ones((1,), jnp.int32)])
    return jnp.sum(left * 2 * right) * itemsize


def to_dense(mps: MPS, n: int) -> np.ndarray:
    """Contract the padded MPS into a dense complex statevector [2**n].
    Host/test only (exponential)."""
    t = cpx.to_np(mps.tensors)  # numpy complex [n, chi, 2, chi]
    v = t[0][0]  # [2, chi]
    for i in range(1, n):
        v = np.tensordot(v, t[i], axes=[[-1], [0]])  # [..., 2, chi]
    return v[..., 0].reshape(-1)
