"""Table III sweep, in-process (reference: runs/table3/run_all.sh — AUC vs
circuit depth, r in {2,4,8,12,16,20} x 6 seeds at nf=50, d=1, gamma=1.0,
200+200 points).

One process for the whole grid: compiled programs are keyed by shape and
the grid shares shapes across seeds (one schedule per r), so the AOT
program-load cost is paid once per depth, not once per run. Artifacts move
to raw/ immediately; runs whose raw test metrics exist are skipped
(resumable).

Env: SEEDS, RS, NF, NTR override the grid.
"""

from __future__ import annotations

import os
import pathlib
import shutil
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parent.parent


def main() -> None:
    os.chdir(ROOT)
    sys.path.insert(0, str(ROOT))
    from qml_cutensornet_tpu.cli import main as qmain
    from qml_cutensornet_tpu.utils.naming import run_info

    nf = int(os.environ.get("NF", "50"))
    ntr = int(os.environ.get("NTR", "200"))
    seeds = [int(s) for s in os.environ.get("SEEDS", "5 8 20 25 30 35").split()]
    rs = [int(r) for r in os.environ.get("RS", "2 4 8 12 16 20").split()]
    df = "elliptic_preproc.csv"

    (HERE / "raw").mkdir(parents=True, exist_ok=True)
    if not (ROOT / "datasets" / df).exists():
        from qml_cutensornet_tpu.cli import make_synthetic

        make_synthetic.main(["make_synthetic.py", "2000"])

    total = len(seeds) * len(rs)
    i = 0
    for r in rs:  # depth-major: one schedule compile per depth
        for s in seeds:
            i += 1
            info = run_info("test", nf, r, 1.0, 1, ntr, s, df)
            if (HERE / "raw" / f"{info}.npy").exists():
                print(f"[table3] {i}/{total} skip r{r} s{s}", flush=True)
                continue
            t0 = time.perf_counter()
            qmain.main(
                ["main.py", "TPU", str(nf), str(r), "1.0", "1", str(ntr),
                 str(ntr), str(s), df]
            )
            for kind in ("train", "test"):
                ri = run_info(kind, nf, r, 1.0, 1, ntr, s, df)
                src = ROOT / "data" / f"{ri}.npy"
                if src.exists():
                    shutil.move(str(src), str(HERE / "raw" / f"{ri}.npy"))
                for junk in (ROOT / f"{ri}.json", ROOT / "kernels" / f"{ri}.npy"):
                    junk.unlink(missing_ok=True)
            print(f"[table3] {i}/{total} r{r} s{s}: "
                  f"{time.perf_counter() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
