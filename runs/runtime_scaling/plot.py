"""Weak-scaling figure (reference: runs/runtime_scaling/plot.py): stacked
runtime breakdown (MPS simulation / inner products / communication) per
data-size-and-device-count point."""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

df = pd.read_csv("results.csv")
df_train = df.loc[df["kernel"] == "train"].sort_values(by="n_procs")
labels = [f"{2*lic} / {n}" for lic, n in zip(df_train["licit_data"], df_train["n_procs"])]

plt.bar(labels, df_train["mpi_wall_time"] / 3600,
        bottom=(df_train["mps_wall_time"] + df_train["dot_wall_time"]) / 3600,
        label="Communication", color="#2a7f62", alpha=0.7)
plt.bar(labels, df_train["dot_wall_time"] / 3600,
        bottom=df_train["mps_wall_time"] / 3600,
        label="Inner products", color="#e8903a", alpha=0.7)
plt.bar(labels, df_train["mps_wall_time"] / 3600,
        label="MPS simulation", color="#3a5fe8", alpha=0.7)

plt.xlabel("Data size / num. chips", fontsize=11)
plt.ylabel("Runtime (hours)", fontsize=11)
plt.legend(fontsize=10)
plt.savefig("runtime_scaling.png", dpi=150, bbox_inches="tight")
print("wrote runtime_scaling.png")
