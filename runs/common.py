"""Shared experiment-harness helpers.

The reference duplicates a filename-parsing + JSON-aggregation block across
seven ``to_csv.py`` scripts (e.g. runs/runtime_scaling/to_csv.py:17-40); here
it lives once. Output CSV schemas match the reference's so downstream
plotting/analysis carries over.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from qml_cutensornet_tpu.utils.naming import parse_run_info  # noqa: E402


def load_profiles(directory: str) -> list[tuple[dict, dict]]:
    """All (params, profiling) pairs from ``{run_info}.json`` files."""
    out = []
    for f in sorted(os.listdir(directory)):
        if not f.endswith(".json"):
            continue
        name = f[: -len(".json")]
        params = parse_run_info(name)
        with open(os.path.join(directory, f)) as fp:
            out.append((params, json.load(fp)))
    return out


def _common_fields(params: dict) -> dict:
    return {
        "data_set": params["dataset"].split(".csv")[0],
        "kernel": params["prefix"],
        "features": params["num_features"],
        "licit_data": params["n_illicit"],
        "entanglement": params["map_style"],
        "layers": params["reps"],
        "gamma": params["gamma"],
        "edge_prob": params["edge_prob"],
        "neighbours": params["nearest_neighbors"],
        "seed": params["data_seed"],
    }


def runtime_scaling_csv(raw_dir: str, out_csv: str) -> pd.DataFrame:
    """Schema of runs/runtime_scaling/to_csv.py."""
    rows = []
    for params, prof in load_profiles(raw_dir):
        row = _common_fields(params)
        row.update(
            n_procs=prof["n_procs"][0],
            mps_wall_time=prof["r0_circ_sim"][0],
            dot_wall_time=prof["r0_product"][0],
            mpi_wall_time=prof["r0_RR_recv"][0],
            total_wall_time=prof["total_time"][0],
            avg_max_chi=(prof["ave max chi x"][0] + prof["ave max chi y"][0]) / 2,
            avg_mps_mem=prof["avg_mps_mem"][0],
        )
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df


def qubit_scaling_csv(raw_dir: str, out_csv: str) -> pd.DataFrame:
    """Schema of runs/qubit_scaling/to_csv.py."""
    rows = []
    for params, prof in load_profiles(raw_dir):
        row = _common_fields(params)
        row.update(
            avg_mps_time=prof["avg_circ_sim"][0],
            avg_dot_time=prof["avg_product"][0],
            avg_max_chi=(prof["ave max chi x"][0] + prof["ave max chi y"][0]) / 2,
            avg_mps_mem=prof["avg_mps_mem"][0],
        )
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df


def crossover_csv(raw_dir: str, out_csv: str, with_mem: bool = True) -> pd.DataFrame:
    """Schema of runs/crossover/to_csv.py (gpu variant includes memory)."""
    rows = []
    for params, prof in load_profiles(raw_dir):
        row = {
            "features": params["num_features"],
            "entanglement": params["map_style"],
            "layers": params["reps"],
            "gamma": params["gamma"],
            "neighbours": params["nearest_neighbors"],
            "seed": params["data_seed"],
            "median_mps_time": prof["median_circ_sim"][0],
            "median_dot_time": prof["median_product"][0],
            "avg_max_chi": (prof["ave max chi x"][0] + prof["ave max chi y"][0]) / 2,
            "q1_mps_time": prof["q1_circ_sim"][0],
            "q3_mps_time": prof["q3_circ_sim"][0],
            "q1_dot_time": prof["q1_product"][0],
            "q3_dot_time": prof["q3_product"][0],
        }
        if with_mem:
            row["avg_mps_mem"] = prof["avg_mps_mem"][0]
        # Engine-config tag: campaign runs suffix the run-info name (e.g.
        # "..._elliptic_preproc_brick_chi128"); the positional parser folds
        # the suffix into "dataset". Kept as a trailing column (the
        # reference-schema columns come first) so multiple configs of the
        # same (nf, d) point stay distinguishable.
        row["config"] = params["dataset"]
        rows.append(row)
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df


def _best_by_auc(metric_rows: dict):
    """Average each metric per key, return the entry with the best AUC."""
    avg = {k: [np.mean(v) for v in vals] for k, vals in metric_rows.items()}
    aucs = avg["auc"]
    i = aucs.index(max(aucs))
    return {m: avg[m][i] for m in avg}


def collect_metric_npys(directory: str, key_fn):
    """Aggregate ``data/{run_info}.npy`` metric dumps: rows are
    [C, accuracy, precision, recall, auc] (main.py:214). ``key_fn(params)``
    groups runs; within a group, metrics are averaged per (C, key) over
    seeds and the best-AUC row is chosen — the reference's table logic
    (runs/table2/to_csv.py, runs/table3/to_csv.py)."""
    groups: dict = defaultdict(lambda: defaultdict(lambda: defaultdict(list)))
    for f in sorted(os.listdir(directory)):
        if not f.endswith(".npy"):
            continue
        name = f[: -len(".npy")]
        params = parse_run_info(name)
        if params["prefix"] != "test":
            continue
        key = key_fn(params)
        rows = np.load(os.path.join(directory, f))
        for row in rows:
            reg = row[0]
            groups[key][reg]["accuracy"].append(row[1])
            groups[key][reg]["precision"].append(row[2])
            groups[key][reg]["recall"].append(row[3])
            groups[key][reg]["auc"].append(row[4])
    results = {}
    for key, per_reg in groups.items():
        merged = defaultdict(dict)
        for reg, metrics in per_reg.items():
            for m, vals in metrics.items():
                merged[m][reg] = vals
        flat = {m: list(d.values()) for m, d in merged.items()}
        results[key] = _best_by_auc(flat)
    return results


def table2_csv(quantum_dir: str, gaussian_dir: str, out_csv: str) -> pd.DataFrame:
    """Schema of runs/table2/to_csv.py: Gaussian baseline row + one row per
    (gamma, d) quantum config, best AUC over the C sweep, averaged over
    seeds."""
    rows = []
    gauss = defaultdict(lambda: defaultdict(list))
    for f in sorted(os.listdir(gaussian_dir)):
        if not f.endswith(".npy"):
            continue
        data = np.load(os.path.join(gaussian_dir, f))
        for row in data:
            gauss[row[0]]["accuracy"].append(row[1])
            gauss[row[0]]["precision"].append(row[2])
            gauss[row[0]]["recall"].append(row[3])
            gauss[row[0]]["auc"].append(row[4])
    flat = {
        m: [np.mean(gauss[reg][m]) for reg in gauss] for m in ("accuracy", "precision", "recall", "auc")
    }
    best = _best_by_auc(flat)
    rows.append({"kernel": "Gaussian", "d": "--", "gamma": "--", "AUC": best["auc"],
                 "recall": best["recall"], "precision": best["precision"],
                 "accuracy": best["accuracy"]})

    quantum = collect_metric_npys(quantum_dir, lambda p: (p["gamma"], p["nearest_neighbors"]))
    for (gamma, d), best in sorted(quantum.items()):
        rows.append({"kernel": "Quantum", "d": d, "gamma": gamma, "AUC": best["auc"],
                     "recall": best["recall"], "precision": best["precision"],
                     "accuracy": best["accuracy"]})
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df


def table3_csv(raw_dir: str, out_csv: str) -> pd.DataFrame:
    """Schema of runs/table3/to_csv.py: one row per circuit depth."""
    by_depth = collect_metric_npys(raw_dir, lambda p: p["reps"])
    rows = [
        {"depth": depth, "AUC": best["auc"], "recall": best["recall"],
         "precision": best["precision"], "accuracy": best["accuracy"]}
        for depth, best in sorted(by_depth.items())
    ]
    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    return df


def mem_evol_series(raw_dir: str) -> dict[str, list[float]]:
    """Parse per-gate 'MPS size ... = <float>' stderr captures
    (runs/mem_evol/plot.py:10-17 convention)."""
    out = {}
    for f in sorted(os.listdir(raw_dir)):
        path = os.path.join(raw_dir, f)
        if not os.path.isfile(path):
            continue
        sizes = []
        with open(path) as fp:
            for line in fp:
                if "MPS size" in line:
                    sizes.append(float(line.split("=")[1]))
        out[f] = sizes
    return out
