"""Best-AUC vs qubit-count figure (reference: runs/qml_figures/plot.py),
generalized: discovers available (nf, ntr) combos in raw/ instead of
hard-coding file names."""

import sys
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import load_profiles  # noqa: F401,E402
from qml_cutensornet_tpu.utils.naming import parse_run_info  # noqa: E402

best = {"train": defaultdict(dict), "test": defaultdict(dict)}
for f in sorted(Path("raw").glob("*.npy")):
    p = parse_run_info(f.stem)
    rows = np.load(f)
    best[p["prefix"]][p["n_illicit"]][p["num_features"]] = float(np.max(rows[:, 4]))

fig, axes = plt.subplots(1, 2, figsize=(10, 4), sharey=True)
for ax, split in zip(axes, ("train", "test")):
    for ntr, series in sorted(best[split].items()):
        qs = sorted(series)
        ax.plot(qs, [series[q] for q in qs], marker="o", label=f"{2*ntr}")
    ax.set_xlabel("Number of Features")
    ax.set_title(split)
    ax.set_ylim(0.5, 1.0)
axes[0].set_ylabel("Best AUC")
axes[0].legend(loc="lower right", title="Data Size")
fig.savefig("qml_figures.png", dpi=150, bbox_inches="tight")
print("wrote qml_figures.png")
