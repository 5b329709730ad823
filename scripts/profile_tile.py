"""On-chip micro-profiler for the Gram tile contraction (round-4 verdict
item 8: tiles run at 6.4% of peak at chi=64 while chi=256 reaches 58% —
find where the chi-64 time goes and whether a cheap restructure wins).

Times, per (chi, tile) point, warm medians over REPS runs:
  current      models/simulate.tile_overlaps_sq as shipped
  nosite_tr    step without the t2 regroup transpose (WRONG RESULT — it
               measures the per-site relayout share)
  two_site     two sites per scan step (halves scan steps; same math)
  one_dispatch tile = the whole batch in one program (vs the tile loop's
               multiple dispatches — isolates dispatch overhead)

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_tile.py
Writes runs/perf_ab/profile_tile.jsonl (one JSON per line).
"""
from __future__ import annotations

import json
import pathlib
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from qml_cutensornet_tpu.ops.cpx import Cpx
from qml_cutensornet_tpu.models.simulate import tile_overlaps_sq

REPS = 5
OUT = pathlib.Path(__file__).resolve().parents[1] / "runs/perf_ab/profile_tile.jsonl"


def rand_states(B, n, chi, seed=0):
    """Random normalized MPS-like site tensors [B, n, chi, 2, chi]."""
    rng = np.random.default_rng(seed)
    re = rng.standard_normal((B, n, chi, 2, chi)).astype(np.float32)
    im = rng.standard_normal((B, n, chi, 2, chi)).astype(np.float32)
    nrm = np.sqrt((re * re + im * im).sum(axis=(2, 3, 4), keepdims=True))
    return Cpx(jnp.asarray(re / nrm), jnp.asarray(im / nrm))


def _step(m, ts, By, Bx, chi, with_transpose=True):
    ty_re, ty_im, tx_re, tx_im = ts
    ty, tx = Cpx(ty_re, ty_im), Cpx(tx_re, tx_im)
    import qml_cutensornet_tpu.ops.cpx as cpx

    mx = cpx.tmap(lambda t: jnp.moveaxis(t, 1, 0).reshape(Bx, By * chi, chi), m)
    txm = cpx.tmap(lambda t: t.reshape(Bx, chi, 2 * chi), tx)
    t1 = cpx.einsum("xmb,xbn->xmn", mx, txm)
    if with_transpose:
        t2 = cpx.tmap(
            lambda t: t.reshape(Bx, By, chi, 2, chi)
            .transpose(1, 2, 3, 0, 4)
            .reshape(By, chi * 2, Bx * chi),
            t1,
        )
    else:  # WRONG math: reinterpret without moving bytes (relayout share probe)
        t2 = cpx.tmap(lambda t: t.reshape(By, chi * 2, Bx * chi), t1)
    tym = cpx.tmap(lambda t: t.reshape(By, chi * 2, chi), ty)
    m2 = cpx.einsum("ykc,ykn->ycn", cpx.conj(tym), t2)
    m2 = cpx.tmap(lambda t: jnp.moveaxis(t.reshape(By, chi, Bx, chi), 2, 1), m2)
    return m2


@partial(jax.jit, static_argnames=("variant",))
def tile_variant(ay: Cpx, ax: Cpx, variant: str = "current"):
    By, n, chi = ay.re.shape[0], ay.re.shape[1], ay.re.shape[2]
    Bx = ax.re.shape[0]
    with jax.default_matmul_precision("highest"):
        m0re = jnp.zeros((By, Bx, chi, chi), jnp.float32).at[:, :, 0, 0].set(1.0)
        m = Cpx(m0re, jnp.zeros_like(m0re))

        def slice_site(i):
            return tuple(
                lax.dynamic_index_in_dim(t, i, axis=1, keepdims=False)
                for t in (ay.re, ay.im, ax.re, ax.im)
            )

        if variant == "two_site":
            def step_i(m, i):
                m = _step(m, slice_site(2 * i), By, Bx, chi)
                m = _step(m, slice_site(2 * i + 1), By, Bx, chi)
                return m, None
            m, _ = lax.scan(step_i, m, jnp.arange(n // 2))
            for j in range(n - (n // 2) * 2):
                m = _step(m, slice_site(n - 1 - j), By, Bx, chi)
        else:
            wt = variant != "nosite_tr"
            def step_i(m, i):
                return _step(m, slice_site(i), By, Bx, chi, with_transpose=wt), None
            m, _ = lax.scan(step_i, m, jnp.arange(n))
        import qml_cutensornet_tpu.ops.cpx as cpx

        ov = cpx.tmap(lambda t: t[:, :, 0, 0], m)
        return cpx.abs2(ov)


def timed(fn, *args):
    out = fn(*args)
    _ = float(np.asarray(out).sum())  # force through the tunnel
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(np.asarray(out).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), s


def main():
    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    recs = []
    n = 32
    for chi in (64, 128):
        B = 100
        states = rand_states(B, n, chi)
        flops_per_pair_site = 32 * chi ** 3  # model (utils/flops.py convention)
        for tile in (32, 100):
            blocks = (-(-B // tile)) ** 2
            for variant in ("current", "nosite_tr", "two_site"):
                if tile == 100 and variant != "current":
                    continue
                sub = Cpx(states.re[:tile], states.im[:tile])
                t, chk = timed(lambda a: tile_variant(a, a, variant), sub)
                # scale a single tile-dispatch time to the full B x B build
                full = t * blocks
                tflops = B * B * n * flops_per_pair_site / full / 1e12
                rec = dict(
                    chi=chi, tile=tile, variant=variant, n=n,
                    t_tile_s=round(t, 5), t_full_scaled_s=round(full, 4),
                    tflops_scaled=round(tflops, 3), checksum=chk,
                    device=str(dev.device_kind),
                )
                print(json.dumps(rec), flush=True)
                recs.append(rec)
    with OUT.open("a") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
