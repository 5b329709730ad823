"""Data-layer semantics: preprocessing quirks, exact sampling seeds, scaler
chain, naming convention."""

import numpy as np
import pandas as pd
import pytest

from qml_cutensornet_tpu.utils import data as D
from qml_cutensornet_tpu.utils.naming import parse_run_info, run_info


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    ddir = str(root / "elliptic_bitcoin_dataset")
    out = str(root / "elliptic_preproc.csv")
    D.make_synthetic_elliptic(dataset_dir=ddir, n_labeled=300, n_unknown=50, seed=1)
    df = D.preprocess_elliptic(dataset_dir=ddir, out_csv=out)
    return root, out, df


def test_preprocess_schema(synth):
    _, out, df = synth
    # merged frame: Class + 165 features, no Node/Time
    assert "Class" in df.columns and "Node" not in df.columns and "Time" not in df.columns
    assert df.shape[1] == 1 + D.N_FEATURES_RAW
    assert set(df["Class"].unique()) <= {0, 1}
    # reference quirk: CSV written WITH the index column, so reading it back
    # yields an extra unnamed column that becomes feature 0 downstream
    # (elliptic_preproc.py:26, SURVEY hard-part 4a)
    reread = pd.read_csv(out)
    assert reread.shape[1] == 2 + D.N_FEATURES_RAW
    assert reread.columns[0].startswith("Unnamed")


def test_draw_sample_exact_seeds(synth):
    _, out, _ = synth
    df = pd.read_csv(out)
    xtr, ytr, xte, yte = D.draw_sample(df, 40, 40, 0.2, seed=3)
    # deterministic: same seeds give identical splits
    xtr2, ytr2, _, _ = D.draw_sample(df, 40, 40, 0.2, seed=3)
    np.testing.assert_array_equal(xtr, xtr2)
    np.testing.assert_array_equal(ytr, ytr2)
    # stratified 80/20 split of 80 points
    assert len(xtr) == 64 and len(xte) == 16
    assert ytr.sum() + yte.sum() == 40  # class 1 total preserved
    # replicate the reference's formula by hand to pin the derived seeds
    s = 3
    manual = pd.concat(
        [
            df[df["Class"] == 0].sample(40, random_state=s * 20 + 2),
            df[df["Class"] == 1].sample(40, random_state=s * 46 + 9),
        ]
    )
    from sklearn.model_selection import train_test_split

    mtr, mte = train_test_split(
        manual, stratify=manual["Class"], test_size=0.2, random_state=s * 26 + 19
    )
    mtr = mtr.drop(columns=["Class"])
    np.testing.assert_array_equal(xtr, np.array(mtr))


def test_feature0_is_row_index(synth):
    _, out, _ = synth
    df = pd.read_csv(out)
    xtr, _, _, _ = D.draw_sample(df, 30, 30, 0.2, seed=1)
    # column 0 of the sampled feature matrix is the preprocessed row index
    assert np.all(xtr[:, 0] == xtr[:, 0].astype(int))
    assert xtr[:, 0].max() < len(df)


def test_scaler_chain_range(synth):
    _, out, _ = synth
    df = pd.read_csv(out)
    xtr, _, xte, _ = D.draw_sample(df, 50, 50, 0.2, seed=2)
    str_, ste = D.scale_features(xtr, xte)
    # train exactly in [0, 2]; test may exceed slightly (transform only)
    assert str_.min() >= 0.0 and str_.max() <= 2.0 + 1e-12
    assert ste.shape == xte.shape


def test_run_info_roundtrip():
    name = run_info("train", 32, 2, 0.5, 6, 200, 7, "elliptic_preproc.csv")
    assert name == "train_Nf32_r2_g0.5_p0.0_nn6_mslinear_Ntr200_s7_elliptic_preproc"
    parsed = parse_run_info(name)
    assert parsed["num_features"] == 32
    assert parsed["reps"] == 2
    assert parsed["gamma"] == 0.5
    assert parsed["nearest_neighbors"] == 6
    assert parsed["n_illicit"] == 200
    assert parsed["data_seed"] == 7
    assert parsed["dataset"] == "elliptic_preproc"


def test_svm_sweep_shapes(synth):
    _, out, _ = synth
    from qml_cutensornet_tpu.models.svm import REGULARIZATION_SWEEP, classical_rbf_sweep

    df = pd.read_csv(out)
    xtr, ytr, xte, yte = D.draw_sample(df, 40, 40, 0.2, seed=5)
    str_, ste = D.scale_features(xtr, xte)
    test_rows, train_rows = classical_rbf_sweep(str_, ytr, ste, yte, verbose=False)
    assert len(test_rows) == len(REGULARIZATION_SWEEP)
    arr = np.asarray(test_rows)
    assert arr.shape == (len(REGULARIZATION_SWEEP), 5)
    # metrics are probabilities; synthetic data carries real signal
    assert np.all(arr[:, 1:] >= 0) and np.all(arr[:, 1:] <= 1)
    assert arr[:, 1].max() > 0.6  # accuracy beats chance on synthetic signal
