"""Site-blocked tile scan (SimConfig.tile_block) pins.

The blocked path pre-combines k adjacent site tensors into [chi, 2^k, chi]
blocks and scans n//k steps (+ a remainder step); the result must match the
per-site scan to summation-order rounding (exactly representable here: f64
on random O(1) tensors keeps the difference ~1e-13).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.models.simulate import _combine_sites, tile_overlaps_sq


def _rand_sites(rng, b, n, chi, dtype=jnp.float64):
    re = rng.standard_normal((b, n, chi, 2, chi)) / np.sqrt(chi)
    im = rng.standard_normal((b, n, chi, 2, chi)) / np.sqrt(chi)
    return Cpx(jnp.asarray(re, dtype), jnp.asarray(im, dtype))


@pytest.mark.parametrize("n,k", [(8, 2), (8, 4), (7, 2), (7, 4), (3, 4), (9, 3)])
def test_blocked_matches_per_site(n, k):
    rng = np.random.default_rng(7)
    ay = _rand_sites(rng, 3, n, 8)
    ax = _rand_sites(rng, 4, n, 8)
    base = np.asarray(tile_overlaps_sq(ay, ax))
    blocked = np.asarray(tile_overlaps_sq(ay, ax, site_block=k))
    np.testing.assert_allclose(blocked, base, rtol=1e-12, atol=1e-13)


def test_combine_sites_shapes():
    rng = np.random.default_rng(3)
    a = _rand_sites(rng, 2, 7, 4)
    main, tail = _combine_sites(a, 3)
    assert main.re.shape == (2, 2, 4, 8, 4)
    assert tail.re.shape == (2, 4, 2, 4)
    # n < k: everything lands in the tail.
    main, tail = _combine_sites(a, 8)
    assert main is None and tail.re.shape == (2, 4, 2 ** 7, 4)


def test_combine_sites_is_exact_contraction():
    # The combined block must equal the explicit chain contraction.
    rng = np.random.default_rng(11)
    a = _rand_sites(rng, 1, 2, 4)
    main, tail = _combine_sites(a, 2)
    assert tail is None
    t0 = np.asarray(a.re[0, 0]) + 1j * np.asarray(a.im[0, 0])
    t1 = np.asarray(a.re[0, 1]) + 1j * np.asarray(a.im[0, 1])
    want = np.einsum("asb,btc->astc", t0, t1).reshape(4, 4, 4)
    got = np.asarray(main.re[0, 0]) + 1j * np.asarray(main.im[0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-14)


def test_config_validation():
    assert SimConfig(tile_block=2).tile_block == 2
    with pytest.raises(ValueError):
        SimConfig(tile_block=0)
    with pytest.raises(ValueError):
        SimConfig(tile_block=9)
