"""Memory-evolution figure (reference: runs/mem_evol/plot.py): mean/min/max
MPS size vs circuit progress for each interaction distance."""

import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import mem_evol_series  # noqa: E402

fig, ax = plt.subplots()
for d, color in (("d6", "mediumblue"), ("d12", "orange")):
    raw = Path(f"raw/{d}")
    if not raw.is_dir():
        continue
    series = mem_evol_series(str(raw))
    if not series or not any(series.values()):
        continue
    nticks = max(len(v) for v in series.values())
    progress = [100 * i / nticks for i in range(nticks)]
    stacked = list(zip(*[v for v in series.values() if len(v) == nticks]))
    mean = [np.mean(t) for t in stacked]
    lo = [np.min(t) for t in stacked]
    hi = [np.max(t) for t in stacked]
    ax.plot(progress, mean, linewidth=0.75, color=color, label=f"d={d[1:]}")
    ax.fill_between(progress, lo, hi, color=color, alpha=0.2)

ax.legend(fontsize=10)
ax.set_xlabel("Gates applied (%)", fontsize=11)
ax.set_ylabel("MPS size (MiB)", fontsize=11)
ax.set_yscale("log")
fig.savefig("mem_evol.png", dpi=150, bbox_inches="tight")
print("wrote mem_evol.png")
