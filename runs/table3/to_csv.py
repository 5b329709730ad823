import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import table3_csv  # noqa: E402

print(table3_csv("raw/", "results.csv"))
