"""Large-chi memory path of the Gram build (models/gram.py): chi-bucket
compression of simulated batches and host-resident states with per-tile
uploads. On-chip motivation: at chi >= 512 / nq=100 the assembled state
set plus site-major scan temps exceed a v5e's HBM (docs/DESIGN.md §2.6).
Here (CPU) we force each regime with QMLTPU_STATES_DEVICE_BYTES and check
the kernel is bit-for-bit regime-independent."""

import numpy as np

import qml_cutensornet_tpu as q
from qml_cutensornet_tpu.config import SimConfig
from qml_cutensornet_tpu.models.gram import _chi_bucket, simulate_dataset


def _build(monkeypatch, device_bytes):
    monkeypatch.setenv("QMLTPU_STATES_DEVICE_BYTES", device_bytes)
    rng = np.random.default_rng(3)
    nq = 10
    emap = q.entanglement_graph(nq, 3)
    ansatz = q.KernelStateAnsatz(nq, 2, 1.0, emap)
    X = rng.uniform(0, 2, size=(11, nq))
    # chi above the schedule's structural need so buckets actually trim.
    cfg = SimConfig(chi=256, truncation_error=1e-16, precision="f32")
    return q.build_kernel_matrix(ansatz, X, cfg=cfg, sim_batch=4, tile=4)


def test_host_resident_tiles_match_device_resident(monkeypatch):
    k_dev = _build(monkeypatch, "1e12")  # everything device-resident
    k_host = _build(monkeypatch, "0")  # force host residency + per-tile upload
    # Same contraction programs on the same trimmed blocks: identical
    # results, not merely close.
    np.testing.assert_array_equal(k_dev, k_host)
    assert np.abs(np.diag(k_dev) - 1.0).max() < 1e-6


def test_chi_bucket_rules():
    # 64-granularity, 128 floor, cap, and the small-chi no-op guarantee
    # (warm-cache shapes must not change for existing chi <= 128 configs).
    assert _chi_bucket(1, 64) == 64
    assert _chi_bucket(77, 96) == 96
    assert _chi_bucket(130, 512) == 192
    assert _chi_bucket(192, 256) == 192
    assert _chi_bucket(300, 512) == 320
    assert _chi_bucket(513, 1024) == 576
    assert _chi_bucket(1000, 1024) == 1024


def test_bucket_compression_is_lossless(monkeypatch):
    """States sliced to their chi bucket reproduce the exact same kernel
    as full-padding states (exact-zero padding invariant)."""
    monkeypatch.setenv("QMLTPU_STATES_DEVICE_BYTES", "1e12")
    rng = np.random.default_rng(5)
    nq = 8
    emap = q.entanglement_graph(nq, 3)
    ansatz = q.KernelStateAnsatz(nq, 2, 1.0, emap)
    X = rng.uniform(0, 2, size=(6, nq))
    cfg = SimConfig(chi=192, truncation_error=1e-16, precision="f32")
    tensors, _, chis, _ = simulate_dataset(ansatz.schedule, X, cfg, sim_batch=6)
    c = tensors.re.shape[2]
    assert c == _chi_bucket(int(chis.max()), c) or c <= 128
    # Everything beyond each bond's tracked rank must be exact zeros.
    cap = int(chis.max())
    assert not np.asarray(tensors.re)[:, :, cap:, :, cap:].any()
