"""Experiment-harness aggregation: output CSV schemas must match the
reference's to_csv outputs field for field."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location("runs_common", ROOT / "runs" / "common.py")
common = importlib.util.module_from_spec(spec)
spec.loader.exec_module(common)

from qml_cutensornet_tpu.utils.naming import run_info  # noqa: E402


def _write_profile(d, name, **kv):
    prof = {
        "n_procs": [4, "devices"], "lenX": [64, "entries"], "lenY": [None, "entries"],
        "r0_circ_gen": [0.1, "seconds"], "r0_circ_sim": [10.0, "seconds"],
        "avg_circ_sim": [0.2, "seconds"], "median_circ_sim": [0.18, "seconds"],
        "q1_circ_sim": [0.15, "seconds"], "q3_circ_sim": [0.22, "seconds"],
        "gpu_mps_mem": [100.0, "MiB"], "avg_mps_mem": [1.5, "MiB"],
        "avg_fidelity": [0.999999, ""], "ave max chi x": [33.5, "chi x"],
        "ave max chi y": [33.5, "chi y"], "r_nonRR_recv": [0.0, "seconds"],
        "r0_RR_recv": [0.5, "seconds"], "kernel_mat_time": [20.0, "seconds"],
        "total_time": [31.0, "seconds"], "r0_product": [19.0, "seconds"],
        "avg_product": [0.01, "seconds"], "median_product": [0.009, "seconds"],
        "q1_product": [0.008, "seconds"], "q3_product": [0.011, "seconds"],
    }
    prof.update(kv)
    with open(d / (name + ".json"), "w") as f:
        json.dump(prof, f)


def test_runtime_and_qubit_scaling_csv(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    for nf, nprocs in [(165, 2), (165, 4)]:
        name = run_info("train", nf, 2, 0.1, 1, 100 * nprocs, 5, "elliptic_preproc.csv")
        _write_profile(raw, name + f"_m{nprocs}" if False else name, n_procs=[nprocs, "devices"])
        if nprocs == 2:
            continue
    # two files would collide on the same name; use separate dirs per point
    df = common.runtime_scaling_csv(str(raw), str(tmp_path / "results.csv"))
    for col in ["data_set", "kernel", "n_procs", "features", "licit_data", "entanglement",
                "layers", "gamma", "edge_prob", "neighbours", "seed", "mps_wall_time",
                "dot_wall_time", "mpi_wall_time", "total_wall_time", "avg_max_chi", "avg_mps_mem"]:
        assert col in df.columns, col
    assert df.iloc[0]["features"] == 165
    assert df.iloc[0]["mps_wall_time"] == 10.0
    assert df.iloc[0]["avg_max_chi"] == 33.5

    df2 = common.qubit_scaling_csv(str(raw), str(tmp_path / "r2.csv"))
    for col in ["avg_mps_time", "avg_dot_time", "avg_max_chi", "avg_mps_mem"]:
        assert col in df2.columns, col


def test_crossover_csv(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    for d in [2, 6]:
        _write_profile(raw, run_info("train", 100, 2, 1.0, d, 5, 5, "elliptic_preproc.csv"))
    df = common.crossover_csv(str(raw), str(tmp_path / "g.csv"), with_mem=True)
    assert set(df["neighbours"]) == {2, 6}
    for col in ["median_mps_time", "median_dot_time", "q1_mps_time", "q3_mps_time",
                "q1_dot_time", "q3_dot_time", "avg_max_chi", "avg_mps_mem"]:
        assert col in df.columns, col


def test_table_aggregations(tmp_path):
    qdir = tmp_path / "quantum"
    gdir = tmp_path / "gaussian"
    qdir.mkdir()
    gdir.mkdir()
    rng = np.random.default_rng(0)
    # gaussian baseline: two seeds
    for s in (5, 8):
        rows = np.column_stack([
            [4, 1, 0.1], rng.uniform(0.7, 0.9, 3), rng.uniform(0.7, 0.9, 3),
            rng.uniform(0.7, 0.9, 3), rng.uniform(0.7, 0.9, 3),
        ])
        np.save(gdir / f"seed_{s}.npy", rows)
    # quantum: two (gamma, d) configs x two seeds (+ train files to ignore)
    for s in (5, 8):
        for g in (0.5, 1.0):
            for d in (1, 4):
                rows = np.column_stack([
                    [4, 1, 0.1], rng.uniform(0.7, 0.95, 3), rng.uniform(0.7, 0.95, 3),
                    rng.uniform(0.7, 0.95, 3), rng.uniform(0.7, 0.95, 3),
                ])
                np.save(qdir / (run_info("test", 50, 2, g, d, 200, s, "elliptic_preproc.csv") + ".npy"), rows)
                np.save(qdir / (run_info("train", 50, 2, g, d, 200, s, "elliptic_preproc.csv") + ".npy"), rows)
    df = common.table2_csv(str(qdir), str(gdir), str(tmp_path / "t2.csv"))
    assert list(df.columns) == ["kernel", "d", "gamma", "AUC", "recall", "precision", "accuracy"]
    assert df.iloc[0]["kernel"] == "Gaussian"
    assert len(df) == 1 + 4  # baseline + 4 quantum configs
    assert ((df["AUC"] >= 0) & (df["AUC"] <= 1)).all()

    # table3: depth sweep
    t3 = tmp_path / "t3raw"
    t3.mkdir()
    for s in (5, 8):
        for r in (2, 8):
            rows = np.column_stack([
                [4, 1, 0.1], rng.uniform(0.7, 0.95, 3), rng.uniform(0.7, 0.95, 3),
                rng.uniform(0.7, 0.95, 3), rng.uniform(0.7, 0.95, 3),
            ])
            np.save(t3 / (run_info("test", 50, r, 1.0, 1, 200, s, "elliptic_preproc.csv") + ".npy"), rows)
    df3 = common.table3_csv(str(t3), str(tmp_path / "t3.csv"))
    assert list(df3["depth"]) == [2, 8]


def test_mem_evol_parsing(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "0.out").write_text("junk\n[DEBUG] MPS size (MiB) = 0.5\n[DEBUG] MPS size (MiB) = 1.25\n")
    series = common.mem_evol_series(str(raw))
    assert series["0.out"] == [0.5, 1.25]
