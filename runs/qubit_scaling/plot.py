"""Qubit-scaling figure (reference: runs/qubit_scaling/plot.py:1-22):
avg per-circuit MPS simulation time vs qubit count, one curve per gamma,
at d=6. Reads results.csv produced by to_csv.py."""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

df = pd.read_csv("results.csv")
d = int(df["neighbours"].mode()[0])
df = df.loc[df["neighbours"] == d]

fig, ax = plt.subplots()
for gamma, grp in sorted(df.groupby("gamma")):
    grp = grp.sort_values("features")
    ax.plot(grp["features"], grp["avg_mps_time"], marker="o", label=f"{gamma}")

ax.legend(title=r"$\gamma$", fontsize=10)
ax.set_xticks(sorted(df["features"].unique()))
ax.set_xlabel("Number of qubits", fontsize=11)
ax.set_ylabel("MPS sim. time (s)", fontsize=11)
ax.set_title(f"Per-circuit MPS simulation time (r=2, d={d}, 1 TPU chip)")
fig.savefig("qubit_scaling.png", dpi=150, bbox_inches="tight")
print(df[["features", "gamma", "avg_mps_time", "avg_max_chi"]].to_string(index=False))
