"""Gate-convention golden tests.

Golden values are the TKET-convention matrices the reference's Julia backend
defines explicitly (KernelPkg/src/KernelPkg.jl:8-42): matrix angle
theta = pi * alpha / 2 for pytket exponent alpha. Engine gates are (re, im)
real pairs (ops/cpx.py); tests materialize them as numpy complex.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qml_cutensornet_tpu.ops import cpx, dense, gates

F64 = jnp.float64


def as_np(x):
    return cpx.to_np(x)


@pytest.mark.parametrize("alpha", [0.0, 0.3, 1.0, 1.7, -0.4])
def test_rz_matches_golden(alpha):
    theta = np.pi * alpha / 2
    golden = np.diag([np.exp(-1j * theta), np.exp(1j * theta)])
    np.testing.assert_allclose(as_np(gates.rz(theta, F64)), golden, atol=1e-14)
    np.testing.assert_allclose(
        as_np(gates.rz_phases(theta, F64)), np.diag(golden), atol=1e-14
    )


@pytest.mark.parametrize("alpha", [0.0, 0.25, 1.0, -0.8])
def test_rx_matches_golden(alpha):
    theta = np.pi * alpha / 2
    golden = np.array(
        [[np.cos(theta), -1j * np.sin(theta)], [-1j * np.sin(theta), np.cos(theta)]]
    )
    np.testing.assert_allclose(as_np(gates.rx(theta, F64)), golden, atol=1e-14)


@pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0, 2.3, -1.1])
def test_xxphase_matches_golden(alpha):
    theta = np.pi * alpha / 2
    c, s = np.cos(theta), np.sin(theta)
    golden = np.array(
        [
            [c, 0, 0, -1j * s],
            [0, c, -1j * s, 0],
            [0, -1j * s, c, 0],
            [-1j * s, 0, 0, c],
        ]
    )
    np.testing.assert_allclose(as_np(gates.xxphase(theta, F64)), golden, atol=1e-14)


@pytest.mark.parametrize("alpha", [0.0, 0.5, -0.7])
def test_zzphase_matches_golden(alpha):
    theta = np.pi * alpha / 2
    em, ep = np.exp(-1j * theta), np.exp(1j * theta)
    golden = np.diag([em, ep, ep, em])
    np.testing.assert_allclose(as_np(gates.zzphase(theta, F64)), golden, atol=1e-14)
    np.testing.assert_allclose(
        as_np(gates.zzphase_phases(theta, F64)), np.diag(golden), atol=1e-14
    )


def test_hadamard_and_swap():
    h = as_np(gates.hadamard(F64))
    np.testing.assert_allclose(h @ h, np.eye(2), atol=1e-14)
    np.testing.assert_allclose(h, dense.HADAMARD, atol=1e-15)
    sw = as_np(gates.swap(F64))
    np.testing.assert_allclose(sw, dense.SWAP, atol=1e-15)


def test_gates_are_unitary():
    for theta in [0.17, 1.3]:
        for g in [
            as_np(gates.xxphase(theta, F64)),
            as_np(gates.rz(theta, F64)),
            as_np(gates.rx(theta, F64)),
            as_np(gates.zzphase(theta, F64)),
            as_np(gates.xxphase_swap(theta, F64)),
        ]:
            np.testing.assert_allclose(g @ g.conj().T, np.eye(g.shape[0]), atol=1e-14)


def test_xxphase_swap_is_fused_product():
    theta = 0.42
    want = dense.xxphase(theta) @ dense.SWAP
    np.testing.assert_allclose(as_np(gates.xxphase_swap(theta, F64)), want, atol=1e-14)


def test_batched_gate_construction():
    thetas = np.linspace(-1, 2, 7)
    got = as_np(gates.xxphase(jnp.asarray(thetas), F64))
    assert got.shape == (7, 4, 4)
    for i, t in enumerate(thetas):
        np.testing.assert_allclose(got[i], dense.xxphase(t), atol=1e-14)


def test_cpx_algebra():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 7)) + 1j * rng.normal(size=(5, 7))
    b = rng.normal(size=(7, 3)) + 1j * rng.normal(size=(7, 3))
    ca, cb = cpx.from_np(a, F64), cpx.from_np(b, F64)
    np.testing.assert_allclose(cpx.to_np(cpx.matmul(ca, cb)), a @ b, atol=1e-12)
    np.testing.assert_allclose(
        cpx.to_np(cpx.einsum("ij,jk->ik", ca, cb)), a @ b, atol=1e-12
    )
    np.testing.assert_allclose(cpx.to_np(cpx.conj(ca)), a.conj(), atol=1e-15)
    np.testing.assert_allclose(np.asarray(cpx.abs2(ca)), np.abs(a) ** 2, atol=1e-12)
    # embedding homomorphism: E(A)E(B) = E(AB)
    ea, eb = np.asarray(cpx.embed(ca)), np.asarray(cpx.embed(cb))
    eab = np.asarray(cpx.embed(cpx.matmul(ca, cb)))
    np.testing.assert_allclose(ea @ eb, eab, atol=1e-12)
