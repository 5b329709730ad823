"""End-to-end CLI tests: the reference argv contract through synthetic data,
Gram build, SVC sweep, and all output artifacts."""

import json
import os
import pathlib

import numpy as np
import pytest

from qml_cutensornet_tpu.cli import classical_main, main, main_no_test, main_track_mem
from qml_cutensornet_tpu.utils.data import make_synthetic_elliptic, preprocess_elliptic


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cliwork")
    old = os.getcwd()
    os.chdir(wd)
    make_synthetic_elliptic(dataset_dir="datasets/elliptic_bitcoin_dataset",
                            n_labeled=400, n_unknown=50, seed=2)
    preprocess_elliptic()
    yield wd
    os.chdir(old)


ARGS = ["prog", "TPU", "4", "1", "0.5", "1", "30", "30", "3", "elliptic_preproc.csv"]


def test_main_end_to_end(workdir):
    os.environ["QMLTPU_CHI"] = "4"
    os.environ["QMLTPU_PRECISION"] = "f64"
    try:
        main.main(ARGS)
    finally:
        os.environ.pop("QMLTPU_CHI")
        os.environ.pop("QMLTPU_PRECISION")

    info = "Nf4_r1_g0.5_p0.0_nn1_mslinear_Ntr30_s3_elliptic_preproc"
    ktr = np.load(f"kernels/train_{info}.npy")
    kte = np.load(f"kernels/test_{info}.npy")
    assert ktr.shape == (48, 48)  # 80% of 60
    assert kte.shape == (12, 48)
    np.testing.assert_allclose(ktr, ktr.T, atol=1e-10)
    np.testing.assert_allclose(np.diag(ktr), 1.0, atol=1e-10)
    assert np.linalg.eigvalsh(ktr).min() > -1e-10
    assert np.all((kte >= -1e-12) & (kte <= 1 + 1e-12))

    # SVC sweep outputs: 11 C values x [C, acc, prec, recall, auc]
    test_rows = np.load(f"data/test_{info}.npy")
    train_rows = np.load(f"data/train_{info}.npy")
    assert test_rows.shape == (11, 5) and train_rows.shape == (11, 5)

    # profiling JSONs with the reference key schema (C15)
    prof = json.load(open(f"train_{info}.json"))
    for key in [
        "n_procs", "lenX", "lenY", "r0_circ_sim", "avg_circ_sim",
        "median_circ_sim", "q1_circ_sim", "q3_circ_sim", "gpu_mps_mem",
        "avg_mps_mem", "avg_fidelity", "ave max chi x", "ave max chi y",
        "kernel_mat_time", "total_time", "r0_product", "avg_product",
        "median_product", "q1_product", "q3_product",
    ]:
        assert key in prof, key
    assert prof["avg_fidelity"][0] > 1 - 1e-9
    assert prof["lenX"] == [48, "entries"]


def test_main_no_test(workdir):
    os.environ["QMLTPU_CHI"] = "4"
    try:
        main_no_test.main(["prog", "GPU", "4", "1", "1.0", "1", "20", "20", "5", "elliptic_preproc.csv"])
    finally:
        os.environ.pop("QMLTPU_CHI")
    info = "train_Nf4_r1_g1.0_p0.0_nn1_mslinear_Ntr20_s5_elliptic_preproc"
    ktr = np.load(f"kernels/{info}.npy")
    assert ktr.shape == (32, 32)
    # no test kernel was produced
    assert not pathlib.Path(f"kernels/test_Nf4_r1_g1.0_p0.0_nn1_mslinear_Ntr20_s5_elliptic_preproc.npy").exists()


def test_main_track_mem(workdir, capsys):
    import io, sys

    stderr = io.StringIO()
    old_stderr = sys.stderr
    sys.stderr = stderr
    try:
        os.environ["QMLTPU_CHI"] = "4"
        main_track_mem.main(["prog", "TPU", "4", "1", "0.5", "2", "10", "10", "1", "elliptic_preproc.csv", "0"])
    finally:
        sys.stderr = old_stderr
        os.environ.pop("QMLTPU_CHI")
    lines = [l for l in stderr.getvalue().splitlines() if "MPS size" in l]
    assert len(lines) > 0
    # parseable by the reference's plot.py convention: float(l.split("=")[1])
    sizes = [float(l.split("=")[1]) for l in lines]
    assert all(s > 0 for s in sizes)


def test_classical_main(workdir):
    classical_main.main(["prog", "8", "40", "40", "2", "elliptic_preproc.csv", "raw/gaussian/seed_2.npy"])
    rows = np.load("raw/gaussian/seed_2.npy")
    assert rows.shape == (11, 5)
    assert rows[:, 1].max() > 0.5


def test_bad_argv_raises(workdir):
    with pytest.raises(ValueError):
        main.main(["prog", "XPU", "4", "1", "0.5", "1", "30", "30", "3", "x.csv"])
    with pytest.raises(ValueError):
        main.main(["prog", "TPU", "4"])


def test_chi_auto(workdir):
    """QMLTPU_CHI=auto probes with utils/autotune.choose_chi, the run
    completes, and the chosen chi lands in the profiling JSON."""
    os.environ["QMLTPU_CHI"] = "auto"
    os.environ["QMLTPU_AUTO_CHI_MAX"] = "16"
    try:
        main_no_test.main(["prog", "TPU", "4", "1", "0.5", "2", "10", "10", "7", "elliptic_preproc.csv"])
    finally:
        os.environ.pop("QMLTPU_CHI")
        os.environ.pop("QMLTPU_AUTO_CHI_MAX")
    info = "train_Nf4_r1_g0.5_p0.0_nn2_mslinear_Ntr10_s7_elliptic_preproc"
    prof = json.load(open(f"{info}.json"))
    assert prof["chi"][0] in (8, 16)
    # f32 fidelity tracking carries ~1e-7 stat roundoff even with zero
    # truncation (the kept-fraction product is accumulated in f32).
    assert prof["avg_fidelity"][0] > 1 - 1e-6
    ktr = np.load(f"kernels/{info}.npy")
    # f32 engine noise reaches a few 1e-5 here and varies run-to-run (CPU
    # thread reduction order); this test guards the AUTO-CHI plumbing, not
    # precision — the parity bar is owned by test_mps_vs_dense / the f64
    # golden tests.
    np.testing.assert_allclose(np.diag(ktr), 1.0, atol=2e-4)
