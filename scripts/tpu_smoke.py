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

Modes (round-4 verdict item: gate benches on the smoke test):
  (none)      run the smoke suite; on PASS write a stamp keyed to a hash of
              the Pallas kernel sources (~/.cache/qmltpu_smoke.json).
  --check     exit 0 if the stamp matches the current kernel sources
              (no jax import), 3 if missing/stale.
  --ensure    --check, and on staleness run the full smoke suite. Backlog
              A/B scripts call this before banking any record.
  --selftest  negative control: run a deliberately [B,1,1]-materializing
              kernel in a subprocess and verify the run DIES (the Mosaic
              layout abort the suite exists to catch). Proves the gate
              catches the class, since nothing short of a real run does.
  --abort-kernel  (internal) the subprocess body for --selftest.
"""
from __future__ import annotations

import hashlib
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
STAMP = pathlib.Path.home() / ".cache" / "qmltpu_smoke.json"
# Every file whose edits can change a Mosaic kernel body. blocked_qr.py has
# no pallas_call of its own but routes panel shapes into the QR kernel.
KERNEL_SOURCES = (
    "qml_cutensornet_tpu/ops/pallas_qr.py",
    "qml_cutensornet_tpu/ops/pallas_split.py",
    "qml_cutensornet_tpu/ops/blocked_qr.py",
)


def kernel_fingerprint() -> str:
    h = hashlib.sha256()
    for rel in KERNEL_SOURCES:
        h.update(rel.encode())
        h.update((REPO / rel).read_bytes())
    return h.hexdigest()


def check_stamp() -> bool:
    """True iff a PASS stamp exists for the current kernel sources."""
    try:
        rec = json.loads(STAMP.read_text())
        return bool(rec.get("pass")) and rec["fingerprint"] == kernel_fingerprint()
    except Exception:
        return False


def write_stamp(passed: bool, device_kind: str) -> None:
    import time

    STAMP.parent.mkdir(parents=True, exist_ok=True)
    STAMP.write_text(json.dumps({
        "pass": passed,
        "fingerprint": kernel_fingerprint(),
        "device_kind": device_kind,
        "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }))


def _cx(re, im):
    return np.asarray(re) + 1j * np.asarray(im)


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"  [{status}] {name} {detail}", flush=True)
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

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
    write_stamp(bool(ok), dev.device_kind)
    return 0 if ok else 1


def abort_kernel() -> int:
    """Deliberately materialize a [B,1,1] value inside a Pallas kernel — the
    class the Mosaic layout pass SIGABRTs on during real lowering while
    interpret mode and lowering-only CI accept it (CLAUDE.md ground rules).
    Run only from --selftest's subprocess: a 'passing' run means the abort
    class is NO LONGER caught and the smoke gate has lost its teeth."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if jax.devices()[0].platform != "tpu":
        print("NOT a TPU — abort-kernel selftest is meaningless off-chip.")
        return 2

    def body(x_ref, o_ref):
        s = jnp.sum(x_ref[...], axis=(1, 2), keepdims=True)  # [B,1,1]
        o_ref[...] = x_ref[...] * s

    x = jnp.ones((4, 8, 128), jnp.float32)
    out = pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x)
    out.block_until_ready()
    print("abort-kernel RAN TO COMPLETION (unexpected)")
    return 0


def selftest() -> int:
    """Negative control for the smoke gate: the [B,1,1] kernel must DIE."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, __file__, "--abort-kernel"],
        capture_output=True, text=True, timeout=1800,
    )
    died = proc.returncode != 0 and proc.returncode != 2
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
    print(f"subprocess rc={proc.returncode}; tail: {tail}")
    print("SELFTEST " + ("PASS (abort class caught)" if died
                         else "FAIL — [B,1,1] kernel survived real lowering"))
    return 0 if died else 1


if __name__ == "__main__":
    if "--abort-kernel" in sys.argv:
        sys.exit(abort_kernel())
    if "--selftest" in sys.argv:
        sys.exit(selftest())
    if "--check" in sys.argv:
        fresh = check_stamp()
        print("smoke stamp " + ("FRESH" if fresh else "STALE/MISSING"))
        sys.exit(0 if fresh else 3)
    if "--ensure" in sys.argv:
        if check_stamp():
            print("smoke stamp FRESH — skipping on-chip run")
            sys.exit(0)
        print("smoke stamp STALE/MISSING — running the on-chip suite")
        sys.exit(main())
    sys.exit(main())
