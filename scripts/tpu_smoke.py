"""On-chip smoke test: run EVERY Pallas kernel family on the real TPU.

Why this exists: the Mosaic layout pass runs only on real lowering — both
interpret mode (tests/test_pallas_*.py) and the lowering-only CI
(tests/test_tpu_lowering.py) accept kernel bodies that SIGABRT on chip
(measured round 3: any [B,1,1]-shaped in-kernel value trips the layout.h
"arr.size() >= layout_rank" Check; see CLAUDE.md ground rules). Run this
after ANY kernel-body change, BEFORE queueing on-chip A/B benches:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke.py

Shapes are the smallest kernel-eligible production shapes (chi=64) plus a
chi=128 row for the block-budget arithmetic; the persistent compile cache
makes reruns warm (~1 min). Each family is checked against a numpy golden
where cheap (theta/total) or for its structural invariants (isometry,
exact-zero columns).
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def _cx(re, im):
    return np.asarray(re) + 1j * np.asarray(im)


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"  [{status}] {name} {detail}", flush=True)
    return ok


def main() -> int:
    from qml_cutensornet_tpu.ops import blocked_qr, pallas_qr, pallas_split
    from qml_cutensornet_tpu.ops.cpx import Cpx
    from qml_cutensornet_tpu.ops.svd import _subspace_start

    dev = jax.devices()[0]
    print(f"devices: {jax.devices()}", flush=True)
    if dev.platform != "tpu":
        print("NOT a TPU — this smoke test is meaningless off-chip.")
        return 2

    rng = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    ok = True

    # The engine always runs under default_matmul_precision(cfg.matmul_
    # precision); without it the TPU's bf16 f32-matmul default puts ~3e-4
    # into the blocked path's XLA-side BCGS2 projections (CLAUDE.md).
    # The Pallas kernels pin HIGHEST internally either way.
    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()

    for chi in (64, 128):
        keep, Bn = chi, 6
        m = 2 * chi
        print(f"-- chi={chi} --", flush=True)
        v = Cpx(rnd(Bn, m, keep), rnd(Bn, m, keep))

        for pair in (False, True):
            tag = "pair" if pair else "mgs"
            q = pallas_qr.orthonormalize_batched(v, pair=pair)
            qc = _cx(q.re, q.im)
            g = qc[0].conj().T @ qc[0]
            ok &= check(f"orthonormalize[{tag}]",
                        np.abs(g - np.eye(keep)).max() < 5e-5)

            q, r = pallas_qr.orthonormalize_r_batched(v, pair=pair)
            rec = _cx(q.re, q.im)[0] @ _cx(r.re, r.im)[0]
            ok &= check(f"orthonormalize_r[{tag}]",
                        np.abs(rec - _cx(v.re, v.im)[0]).max() /
                        np.abs(np.asarray(v.re)).max() < 5e-5)

        v0re, v0im = _subspace_start(m, keep, "float32")
        v0 = Cpx(jnp.asarray(v0re), jnp.asarray(v0im))
        th = Cpx(rnd(Bn, m, m), rnd(Bn, m, m))
        q, r = pallas_split.subspace_factor_batched(th, v0, keep, iters=1)
        ok &= check("subspace_factor", np.isfinite(np.asarray(q.re)).all())

        A = Cpx(rnd(Bn, m, chi), rnd(Bn, m, chi))
        B = Cpx(rnd(Bn, chi, m), rnd(Bn, chi, m))
        g4 = Cpx(rnd(Bn, 4, 4), rnd(Bn, 4, 4))
        q, r, tot = pallas_split.gate_split_factor_batched(
            A, B, g4, v0, keep, iters=1)
        # golden total: ||G (a x b)||_F^2
        t0 = _cx(A.re, A.im) @ _cx(B.re, B.im)
        g4c = _cx(g4.re, g4.im)
        thg = np.zeros_like(t0)
        for s in range(2):
            for t in range(2):
                acc = 0
                for u in range(2):
                    for w in range(2):
                        acc = acc + g4c[:, 2*s+t, 2*u+w][:, None, None] * \
                            t0[:, u*chi:(u+1)*chi, w*chi:(w+1)*chi]
                thg[:, s*chi:(s+1)*chi, t*chi:(t+1)*chi] = acc
        tot_g = (np.abs(thg) ** 2).sum(axis=(1, 2))
        ok &= check("gate_split", np.abs(np.asarray(tot) - tot_g).max() /
                    tot_g.max() < 1e-5, f"tot_relerr")

        lam = jnp.abs(rnd(Bn, chi)) + 0.1
        q2, na0, s2, tot2 = pallas_split.brick_gate_split_batched(
            A, B, g4, lam, v0, keep, iters=1)
        thw = thg * np.concatenate([np.asarray(lam)] * 2, axis=1)[:, :, None]
        totw_g = (np.abs(thw) ** 2).sum(axis=(1, 2))
        ok &= check("brick_split", np.abs(np.asarray(tot2) - totw_g).max() /
                    totw_g.max() < 1e-5)

    # blocked path (keep > 128) with Pallas panels — the chi>=256 regime.
    print("-- blocked (k=160, pallas panels) --", flush=True)
    vb = Cpx(rnd(512, 160), rnd(512, 160))
    qb = blocked_qr.qr_orth_blocked(vb, pallas_panels=True)
    qc = _cx(qb.re, qb.im)
    ok &= check("blocked_qr[pallas_panels]",
                np.abs(qc.conj().T @ qc - np.eye(160)).max() < 5e-5)

    print("SMOKE " + ("PASS" if ok else "FAIL"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
