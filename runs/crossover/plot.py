"""Crossover figure (reference: runs/crossover/plot.py): per-circuit MPS
simulation time vs interaction distance for the two truncation-criterion
modes, plus the chi table."""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

def best_per_d(df):
    """One row per interaction distance: the fastest recorded engine
    config (campaign runs record several configs per (nf, d) point,
    distinguished by the trailing "config" column)."""
    return (
        df.loc[df.groupby("neighbours")["median_mps_time"].idxmin()]
        .sort_values("neighbours")
    )


gpu = best_per_d(pd.read_csv("gpu_results.csv"))
cpu = best_per_d(pd.read_csv("cpu_results.csv"))

fig, ax = plt.subplots()
ax.errorbar(gpu["neighbours"], gpu["median_mps_time"],
            yerr=[gpu["median_mps_time"] - gpu["q1_mps_time"],
                  gpu["q3_mps_time"] - gpu["median_mps_time"]],
            marker="o", label="fidelity criterion (GPU-mode)")
ax.errorbar(cpu["neighbours"], cpu["median_mps_time"],
            yerr=[cpu["median_mps_time"] - cpu["q1_mps_time"],
                  cpu["q3_mps_time"] - cpu["median_mps_time"]],
            marker="s", label="cutoff criterion (CPU-mode)")
ax.set_xlabel("Interaction distance d")
ax.set_ylabel("Median MPS simulation time (s)")
ax.set_yscale("log")
ax.legend()
fig.savefig("crossover.png", dpi=150, bbox_inches="tight")

print(pd.merge(gpu, cpu, on="neighbours", suffixes=("_gpu", "_cpu"))[
    ["neighbours", "avg_max_chi_gpu", "avg_max_chi_cpu"]])
