import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import runtime_scaling_csv  # noqa: E402

print(runtime_scaling_csv("raw/", "results.csv"))
