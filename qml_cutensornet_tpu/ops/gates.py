"""Gate matrices in the TKET half-turn convention, as (re, im) pairs.

The reference defines these matrices twice — implicitly via pytket on the GPU
path and explicitly as ITensor ops on the CPU path
(KernelPkg/src/KernelPkg.jl:8-42). The TKET convention parameterizes gates by
an exponent ``alpha`` in half-turns; the matrix angle is ``theta = pi*alpha/2``.

All functions here accept the TRUE angle ``theta`` (radians), broadcast over
leading batch dimensions, and return :class:`~qml_cutensornet_tpu.ops.cpx.Cpx`
stacked matrices (real-pair representation — see ops/cpx.py for why).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from qml_cutensornet_tpu.ops.cpx import Cpx

H_2x2 = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)

SWAP_4x4 = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def _bcast_const(mat: np.ndarray, like) -> jnp.ndarray:
    """Broadcast a constant matrix over the batch shape of ``like``."""
    m = jnp.asarray(mat, dtype=like.dtype)
    return jnp.broadcast_to(m, like.shape[:-2] + m.shape) if like.ndim > 2 else m


def rx(theta, dtype=jnp.float32) -> Cpx:
    """TKET_Rx with true angle t (KernelPkg.jl:8-14):
    [[cos t, -i sin t], [-i sin t, cos t]]."""
    theta = jnp.asarray(theta, dtype=dtype)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    re = jnp.stack([jnp.stack([c, z], -1), jnp.stack([z, c], -1)], -2)
    im = jnp.stack([jnp.stack([z, -s], -1), jnp.stack([-s, z], -1)], -2)
    return Cpx(re, im)


def rz_phases(theta, dtype=jnp.float32) -> Cpx:
    """Diagonal of TKET_Rz (KernelPkg.jl:16-22): diag(e^{-i t}, e^{i t}).
    Returned as phases [..., 2]; applying Rz to an MPS site tensor is a pure
    elementwise multiply — no SVD needed."""
    theta = jnp.asarray(theta, dtype=dtype)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return Cpx(jnp.stack([c, c], -1), jnp.stack([-s, s], -1))


def rz(theta, dtype=jnp.float32) -> Cpx:
    ph = rz_phases(theta, dtype)
    z = jnp.zeros_like(ph.re[..., 0])
    re = jnp.stack([jnp.stack([ph.re[..., 0], z], -1), jnp.stack([z, ph.re[..., 1]], -1)], -2)
    im = jnp.stack([jnp.stack([ph.im[..., 0], z], -1), jnp.stack([z, ph.im[..., 1]], -1)], -2)
    return Cpx(re, im)


def xxphase(theta, dtype=jnp.float32) -> Cpx:
    """XXPhase(t) = exp(-i t X⊗X) (KernelPkg.jl:24-32):
    [[c,0,0,-is],[0,c,-is,0],[0,-is,c,0],[-is,0,0,c]]."""
    theta = jnp.asarray(theta, dtype=dtype)
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    re = jnp.stack(
        [
            jnp.stack([c, z, z, z], -1),
            jnp.stack([z, c, z, z], -1),
            jnp.stack([z, z, c, z], -1),
            jnp.stack([z, z, z, c], -1),
        ],
        -2,
    )
    im = jnp.stack(
        [
            jnp.stack([z, z, z, -s], -1),
            jnp.stack([z, z, -s, z], -1),
            jnp.stack([z, -s, z, z], -1),
            jnp.stack([-s, z, z, z], -1),
        ],
        -2,
    )
    return Cpx(re, im)


def zzphase_phases(theta, dtype=jnp.float32) -> Cpx:
    """Diagonal of ZZPhase (KernelPkg.jl:34-42): diag(e^{-it},e^{it},e^{it},e^{-it}).
    Defined by the reference gate set but never emitted by the ansatz
    (cpu_backend/kernel_state_ansatz.py:124-125)."""
    theta = jnp.asarray(theta, dtype=dtype)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return Cpx(jnp.stack([c, c, c, c], -1), jnp.stack([-s, s, s, -s], -1))


def zzphase(theta, dtype=jnp.float32) -> Cpx:
    ph = zzphase_phases(theta, dtype)
    eye = jnp.eye(4, dtype=ph.re.dtype)
    return Cpx(ph.re[..., :, None] * eye, ph.im[..., :, None] * eye)


def hadamard(dtype=jnp.float32) -> Cpx:
    m = jnp.asarray(H_2x2, dtype=dtype)
    return Cpx(m, jnp.zeros_like(m))


def swap(dtype=jnp.float32) -> Cpx:
    m = jnp.asarray(SWAP_4x4, dtype=dtype)
    return Cpx(m, jnp.zeros_like(m))


def xxphase_swap(theta, dtype=jnp.float32) -> Cpx:
    """Fused XXPhase(theta) @ SWAP on one adjacent pair. XXPhase is symmetric
    under qubit exchange, so this also equals SWAP @ XXPhase(theta). Lets the
    scheduler combine an interaction with a routing move in ONE two-site SVD."""
    xx = xxphase(theta, dtype)
    sw = jnp.asarray(SWAP_4x4, dtype=dtype)
    return Cpx(jnp.einsum("...ij,jk->...ik", xx.re, sw), jnp.einsum("...ij,jk->...ik", xx.im, sw))
