"""Cross-platform TPU lowering of every Pallas kernel family.

Interpret-mode tests (test_pallas_*.py) cover kernel NUMERICS but skip the
Mosaic TPU lowering pass entirely — which is where block-mapping rules are
enforced (e.g. "the last two block dims must be (8, 128)-divisible or
equal to the array dims"). That gap shipped a phase-2 kernel whose 2-D
``tot``/``lam``/``s2`` buffers blocked the batch dim into the sublane slot
and died on the bench chip (backlog_i, 2026-08-19) while CI was green.

``jax.jit(fn).trace(...).lower(lowering_platforms=("tpu",))`` runs the
real Mosaic lowering (through _check_block_mappings and the kernel-body
lowering) on the CPU CI host — no TPU needed. Shapes below include the
exact batch sizes that triggered the bug (block sizes not divisible by 8).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qml_cutensornet_tpu.ops.cpx import Cpx


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _z(*shape):
    return jnp.zeros(shape, jnp.float32)


@pytest.fixture(params=[False, True], ids=["mgs", "mgspair"])
def pair_env(request, monkeypatch):
    monkeypatch.setenv("QMLTPU_MGS_PAIR", "1" if request.param else "0")
    return request.param


def test_orthonormalize_lowers(pair_env):
    from qml_cutensornet_tpu.ops.pallas_qr import (
        orthonormalize_batched, orthonormalize_r_batched)

    # B=5: odd batch, pads to a 2-element-aligned block (not 8-aligned).
    v = Cpx(_z(5, 128, 64), _z(5, 128, 64))
    _lower_tpu(lambda re, im: orthonormalize_batched(Cpx(re, im)).re,
               v.re, v.im)
    _lower_tpu(lambda re, im: orthonormalize_r_batched(Cpx(re, im))[1].re,
               v.re, v.im)


def test_fused_split_lowers(pair_env):
    from qml_cutensornet_tpu.ops.pallas_split import subspace_factor_batched

    th = Cpx(_z(34, 128, 128), _z(34, 128, 128))  # bb=34: not 8-divisible
    v0 = Cpx(_z(128, 64), _z(128, 64))
    _lower_tpu(
        lambda tr, ti, vr, vi: subspace_factor_batched(
            Cpx(tr, ti), Cpx(vr, vi), 64)[0].re,
        th.re, th.im, v0.re, v0.im)


def test_gate_split_lowers(pair_env):
    from qml_cutensornet_tpu.ops.pallas_split import gate_split_factor_batched

    chi, keep, Bn = 64, 64, 102  # the exact backlog_i failure shape
    A = Cpx(_z(Bn, 2 * chi, chi), _z(Bn, 2 * chi, chi))
    Bm = Cpx(_z(Bn, chi, 2 * chi), _z(Bn, chi, 2 * chi))
    g = Cpx(_z(Bn, 4, 4), _z(Bn, 4, 4))
    v0 = Cpx(_z(2 * chi, keep), _z(2 * chi, keep))
    _lower_tpu(
        lambda *a: gate_split_factor_batched(
            Cpx(a[0], a[1]), Cpx(a[2], a[3]), Cpx(a[4], a[5]),
            Cpx(a[6], a[7]), keep)[2],
        A.re, A.im, Bm.re, Bm.im, g.re, g.im, v0.re, v0.im)


def test_brick_split_lowers(pair_env):
    from qml_cutensornet_tpu.ops.pallas_split import brick_gate_split_batched

    chi, keep, Bn = 128, 144, 62  # bb=62: the lam/s2 sublane failure class
    A = Cpx(_z(Bn, 2 * chi, chi), _z(Bn, 2 * chi, chi))
    Bm = Cpx(_z(Bn, chi, 2 * chi), _z(Bn, chi, 2 * chi))
    g = Cpx(_z(Bn, 4, 4), _z(Bn, 4, 4))
    lam = _z(Bn, chi)
    v0 = Cpx(_z(2 * chi, keep), _z(2 * chi, keep))
    _lower_tpu(
        lambda *a: brick_gate_split_batched(
            Cpx(a[0], a[1]), Cpx(a[2], a[3]), Cpx(a[4], a[5]), a[6],
            Cpx(a[7], a[8]), keep)[3],
        A.re, A.im, Bm.re, Bm.im, g.re, g.im, lam, v0.re, v0.im)


def test_iters2_variants_lower():
    """iters=2 unrolls extra orth bodies + the v scratch — lower that
    variant too (it is the opt-in QMLTPU_SUBSPACE_ITERS=2 config)."""
    from qml_cutensornet_tpu.ops.pallas_split import subspace_factor_batched

    th = Cpx(_z(6, 64, 64), _z(6, 64, 64))
    v0 = Cpx(_z(64, 32), _z(64, 32))
    _lower_tpu(
        lambda tr, ti, vr, vi: subspace_factor_batched(
            Cpx(tr, ti), Cpx(vr, vi), 32, iters=2)[0].re,
        th.re, th.im, v0.re, v0.im)
