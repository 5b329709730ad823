"""Per-phase timing of ONE two-site update at large chi, on chip.

DESIGN.md §7's triage puts chi >= 512 in the compute-bound regime at only
~12-15% of the v5e f32-HIGHEST ceiling; this script decomposes one
batched two-site op into its phases and times each in isolation so the
next optimization targets the measured hotspot, not a guess:

  theta   a,b -> theta (gate applied)             [2 big cpx matmuls]
  mm3     w = theta^H v; v = theta w; r = q^H theta (no orths)
  orth    one blocked-BCGS2 orthonormalization of [B, m, nc]
  split   the full _split_subspace (mm3 + 2 orths + mask math)
  apply   full mps.apply_2site on a synthetic state (adds slice/update)

Each phase runs as jit(scan over REPS iterations) so per-dispatch latency
amortizes; a scalar is materialized to stop the clock (CLAUDE.md timing
rule). Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_op.py 512 10

Writes one JSON line per (phase, chi) to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp
    from jax import lax

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.ops import cpx, svd
    from qml_cutensornet_tpu.ops.cpx import Cpx

    cfg = SimConfig(chi=chi, svd_method="subspace", oversample=16)
    m = k = 2 * chi
    nc = chi + cfg.oversample
    rdt = jnp.float32
    rng = np.random.default_rng(0)

    def randc(*shape):
        return Cpx(
            jnp.asarray(rng.standard_normal(shape), rdt),
            jnp.asarray(rng.standard_normal(shape), rdt),
        )

    a = randc(B, chi, 2, chi)
    b = randc(B, chi, 2, chi)
    g = randc(2, 2, 2, 2)
    v0re, v0im = svd._subspace_start(m, nc, "float32")
    v0 = Cpx(jnp.asarray(v0re), jnp.asarray(v0im))

    def theta_of(a_, b_):
        th = cpx.einsum("asb,btc->astc", a_, b_)
        th = cpx.einsum("stuv,auvc->astc", g, th)
        return cpx.tmap(lambda t: t.reshape(m, k), th)

    vmtheta = jax.vmap(theta_of)
    theta = jax.block_until_ready(vmtheta(a, b))

    def phase_theta(_):
        th = vmtheta(a, b)
        return jnp.sum(th.re[:, 0, 0])

    def mm3_one(th):
        w = cpx.einsum("ij,ik->jk", cpx.conj(th), v0)
        v = cpx.einsum("ij,jk->ik", th, w)
        r = cpx.einsum("mi,mk->ik", cpx.conj(v), th)
        return jnp.sum(r.re[0])

    def phase_mm3(_):
        return jnp.sum(jax.vmap(mm3_one)(theta))

    def phase_orth(_):
        w = jax.vmap(lambda th: cpx.qr_orth(
            cpx.einsum("ij,ik->jk", cpx.conj(th), v0),
            fused=cfg.fused_split, interpret=cfg.fused_interpret,
        ))(theta)
        return jnp.sum(w.re[:, 0, 0])

    def split_one(th):
        left, right, kf, rank = svd._split_subspace(th, cfg, keep=chi)
        return jnp.sum(right.re[0]) + kf

    def phase_split(_):
        return jnp.sum(jax.vmap(split_one)(theta))

    def timed(name, fn):
        def scanned(x0):
            def body(c, _):
                return c + fn(c), None
            out, _ = lax.scan(body, x0, None, length=reps)
            return out
        run = jax.jit(scanned)
        with jax.default_matmul_precision(cfg.matmul_precision):
            np.asarray(run(jnp.float32(0.0)))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(run(jnp.float32(0.0)))
            dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "phase": name, "chi": chi, "B": B, "seconds_per_op": round(dt, 5)
        }))
        sys.stdout.flush()

    timed("theta", phase_theta)
    timed("mm3", phase_mm3)
    timed("orth1", phase_orth)
    timed("split", phase_split)


if __name__ == "__main__":
    main()
