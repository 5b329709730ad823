import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import crossover_csv  # noqa: E402

print(crossover_csv("raw/gpu/", "gpu_results.csv", with_mem=True))
print(crossover_csv("raw/cpu/", "cpu_results.csv", with_mem=False))
