"""Blocked BCGS2 + scanned-MGS2-panel orthonormalizer (ops/blocked_qr.py):
the large-chi path where the Pallas kernel no longer fits VMEM. Tested
directly on CPU (eligibility normally requires TPU; tests call the
function)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_cutensornet_tpu.ops import cpx
from qml_cutensornet_tpu.ops.blocked_qr import qr_orth_blocked
from qml_cutensornet_tpu.ops.cpx import Cpx


def _as_cpx(m, dtype=np.float32):
    return Cpx(jnp.asarray(m.real.astype(dtype)), jnp.asarray(m.imag.astype(dtype)))


def _orth_err(q):
    qn = cpx.to_np(q)
    nz = np.linalg.norm(qn, axis=0) > 0.5
    g = qn[:, nz].conj().T @ qn[:, nz]
    return np.abs(g - np.eye(g.shape[0])).max()


def _span_err(q, v):
    """|| (I - QQ^H) v || / ||v|| — Q must cover v's column space."""
    qn, vn = cpx.to_np(q), cpx.to_np(v)
    r = vn - qn @ (qn.conj().T @ vn)
    return np.linalg.norm(r) / np.linalg.norm(vn)


@pytest.mark.parametrize("m,k", [(256, 96), (512, 256), (300, 160)])
def test_orthonormal_and_spanning_f32(m, k):
    rng = np.random.default_rng(m + k)
    v = rng.normal(size=(m, k)) + 1j * rng.normal(size=(m, k))
    q = qr_orth_blocked(_as_cpx(v))
    assert _orth_err(q) < 5e-6
    assert _span_err(q, _as_cpx(v)) < 5e-6


def test_degenerate_spectrum_and_rank_deficiency():
    """Exactly repeated singular values and dependent columns: dependent
    directions are ZEROED (not junk), the span is still covered."""
    rng = np.random.default_rng(7)
    m, r = 256, 40
    u, _ = np.linalg.qr(rng.normal(size=(m, r)) + 1j * rng.normal(size=(m, r)))
    w, _ = np.linalg.qr(rng.normal(size=(96, r)) + 1j * rng.normal(size=(96, r)))
    # Weak cluster at 1e-3: well above the f32 detectability boundary
    # (content at ~1e-5 relative, where real directions and amplified
    # noise become indistinguishable, is out of scope by design — the
    # engine's own sv-ratio floor masks such directions anyway).
    s = np.concatenate([np.full(10, 1.0), np.full(10, 1e-2), np.full(20, 1e-3)])
    v = (u * s) @ w.conj().T  # [m, 96], rank 40 with degenerate clusters
    vc = _as_cpx(v)
    q = qr_orth_blocked(vc)
    qn = cpx.to_np(q)
    norms = np.linalg.norm(qn, axis=0)
    # Every column is either ~unit or EXACTLY zero; wholly-dependent
    # panels (past the rank) are zeroed.
    assert np.all((norms > 0.99) | (norms == 0.0))
    assert (norms == 0.0).sum() >= 30
    # Orthogonality contract (same as the Householder path's accepted junk
    # behavior): SIGNIFICANT directions (nonzero projection weight) must be
    # mutually orthonormal to f32 scale AND orthogonal to any noise-floor
    # junk survivors, so junk can never double-count real weight — the
    # engine's sv-ratio floor (ops/svd.py) masks the junk itself.
    nz = np.nonzero(norms > 0.5)[0]
    rfac = qn[:, nz].conj().T @ v
    sig = np.linalg.norm(rfac, axis=1)
    real = sig > 1e-4 * sig.max()
    g = qn[:, nz].conj().T @ qn[:, nz] - np.eye(len(nz))
    assert np.abs(g[np.ix_(real, real)]).max() < 1e-5
    if (~real).sum():
        assert np.abs(g[np.ix_(real, ~real)]).max() < 1e-5
    # The kept columns must span the numerically resolvable range: after
    # f32 projections against the dominant cluster, the 1e-2 cluster's
    # directions carry relative noise ~eps/1e-2 ≈ 1e-5, amplified by the
    # double orthonormalization — a few 1e-4 of span residual is the f32
    # floor here, second-order in kernel entries.
    top = u[:, :20]  # directions with s >= 1e-2: far above f32 noise
    proj = top - qn @ (qn.conj().T @ top)
    assert np.linalg.norm(proj) / np.linalg.norm(top) < 5e-4


def test_exact_zero_columns_stay_zero():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(128, 64)) + 1j * rng.normal(size=(128, 64))
    v[:, 10] = 0.0
    v[:, 40:50] = 0.0
    q = cpx.to_np(qr_orth_blocked(_as_cpx(v)))
    assert np.all(q[:, 10] == 0.0)
    assert np.all(q[:, 40:50] == 0.0)


def test_vmap_and_f64():
    rng = np.random.default_rng(9)
    vb = rng.normal(size=(4, 128, 96)) + 1j * rng.normal(size=(4, 128, 96))
    q = jax.vmap(qr_orth_blocked)(
        Cpx(jnp.asarray(vb.real, jnp.float64), jnp.asarray(vb.imag, jnp.float64))
    )
    for i in range(4):
        assert _orth_err(cpx.tmap(lambda t: t[i], q)) < 1e-13


def test_engine_parity_with_forced_blocked_qr(monkeypatch):
    """The full 16q engine run with QMLTPU_BLOCKED_QR=force matches the
    default (Householder-on-CPU) kernel to f32 engine-noise scale."""
    monkeypatch.setenv("QMLTPU_PALLAS_QR", "0")
    import numpy as np

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.gram import build_kernel_matrix

    rng = np.random.default_rng(1)
    n = 16
    emap = entanglement_graph(n, 4)
    X = rng.uniform(0, 2, size=(8, n))
    cfg = SimConfig(chi=64, truncation_error=1e-16, precision="f32",
                    svd_method="subspace", subspace_iters=1)
    ks = {}
    for mode in ("0", "force"):
        monkeypatch.setenv("QMLTPU_BLOCKED_QR", mode)
        ansatz = KernelStateAnsatz(n, 2, 1.0, emap)  # fresh schedule cache
        ks[mode] = build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=8, tile=8)
    assert np.abs(ks["0"] - ks["force"]).max() < 5e-6


def test_pallas_panels_match_scanned(monkeypatch):
    """pallas_panels=True (interpret) must satisfy the same contract as the
    scanned-MGS2 panels: orthonormal significant columns, span preserved,
    exact zeros for zero columns, cross-panel-dependent columns zeroed."""
    from qml_cutensornet_tpu.ops.blocked_qr import qr_orth_blocked

    rng = np.random.default_rng(21)
    m, k = 256, 96  # three panels
    a = rng.standard_normal((m, k)) + 1j * rng.standard_normal((m, k))
    a[:, 40] = a[:, 3] * (1 + 3e-7) + 1e-7 * a[:, 5]  # cross-panel dependent
    a[:, 90:] = 0.0  # exact-zero padding columns
    v = Cpx(jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32))

    qs = qr_orth_blocked(v)  # scanned reference
    qp = qr_orth_blocked(v, pallas_panels=True, interpret=True)
    for q in (qs, qp):
        qc = np.asarray(q.re) + 1j * np.asarray(q.im)
        assert np.abs(qc[:, 90:]).max() == 0.0  # padding stays exact zero
        nz = np.linalg.norm(qc, axis=0) > 0.5
        g = qc[:, nz].conj().T @ qc[:, nz]
        assert np.abs(g - np.eye(nz.sum())).max() < 5e-5
        # span: every input column reproduced by projection
        proj = qc @ (qc.conj().T @ a)
        assert np.abs(a - proj).max() / np.abs(a).max() < 5e-5
    # the dependent column is zeroed by BOTH paths
    for q in (qs, qp):
        qc = np.asarray(q.re) + 1j * np.asarray(q.im)
        assert np.linalg.norm(qc[:, 40]) == 0.0


def test_engine_fused_routes_panels_through_kernel(monkeypatch):
    """Above the single-kernel range (keep > 128, where the whole-chain
    fused split kernel is ineligible and cfg.fused_split instead means
    "Pallas panels inside blocked QR"), the engine's orthonormalizations
    must actually reach the panel kernel (counter-asserted — a staged-chi
    config can silently shrink shapes below eligibility and make the A/B
    vacuous), and the kernel-routed states must match the scanned-panel
    ones to engine-noise scale."""
    monkeypatch.setenv("QMLTPU_PALLAS_QR", "0")  # single-kernel orth off:
    # every orthonormalization goes through blocked_qr (forced below),
    # isolating the panel routing.
    monkeypatch.setenv("QMLTPU_BLOCKED_QR", "force")
    monkeypatch.setenv("QMLTPU_STAGED", "0")  # one stage at full chi: the
    # ramp's small buckets would re-admit the whole-chain fused kernel.
    import numpy as np

    from qml_cutensornet_tpu.config import SimConfig
    from qml_cutensornet_tpu.models.ansatz import KernelStateAnsatz
    from qml_cutensornet_tpu.models.entanglement import entanglement_graph
    from qml_cutensornet_tpu.models.simulate import make_chunked_simulator
    from qml_cutensornet_tpu.ops import pallas_qr

    # Another test with an equal SimConfig may already have traced this
    # engine path; call counters only fire at trace time.
    jax.clear_caches()
    calls = {"n": 0}
    real = pallas_qr.qr_orth_pallas

    def counting(v, interpret=False, pair=None):
        calls["n"] += 1
        return real(v, interpret=interpret, pair=pair)

    # blocked_qr resolves the function through the module object at call
    # time, so patching the module attribute is seen inside traces.
    monkeypatch.setattr(pallas_qr, "qr_orth_pallas", counting)

    rng = np.random.default_rng(4)
    n = 16
    emap = entanglement_graph(n, 3)
    X = rng.uniform(0, 2, size=(2, n))
    common = dict(chi=160, truncation_error=1e-16, precision="f32",
                  svd_method="subspace", subspace_iters=1)
    outs = {}
    for fused in (False, True):
        cfg = SimConfig(fused_split=fused, fused_interpret=fused, **common)
        ansatz = KernelStateAnsatz(n, 1, 1.0, emap)  # fresh schedule cache
        before = calls["n"]
        outs[fused] = jax.block_until_ready(
            make_chunked_simulator(ansatz.schedule, cfg)(X)
        )
        if fused:
            assert calls["n"] > before, "fused run never reached the panel kernel"
        else:
            assert calls["n"] == before
    # Orthonormalizers fix the subspace, not the basis: the two paths'
    # tensors differ by a bond-space gauge rotation. Compare the physical
    # states instead: normalized cross-overlaps must be 1.
    from qml_cutensornet_tpu.models.simulate import tile_overlaps_sq

    kab = np.asarray(tile_overlaps_sq(outs[False].tensors, outs[True].tensors,
                                      precision="highest"))
    kaa = np.asarray(tile_overlaps_sq(outs[False].tensors, outs[False].tensors,
                                      precision="highest"))
    kbb = np.asarray(tile_overlaps_sq(outs[True].tensors, outs[True].tensors,
                                      precision="highest"))
    fid = np.diag(kab) / np.sqrt(np.diag(kaa) * np.diag(kbb))
    assert np.abs(fid - 1.0).max() < 5e-6
