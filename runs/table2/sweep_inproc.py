"""Table II sweep, in-process (reference: runs/table2/run_all.sh — nf=50,
200+200 points, quantum kernels over d x gamma x 6 seeds vs Gaussian).

One process for the whole grid instead of one per run: compiled programs
are keyed by shape, and the grid shares shapes across seeds and gammas
(and re-traces but cache-hits across d), so the per-process program-load
cost through the AOT tunnel (~1-3 min/program) is paid once, not 60+
times. Each run's artifacts move to raw/ immediately (banked progress);
runs whose raw test metrics already exist are skipped, so the sweep is
resumable.

Env: SEEDS, DS, GAMMAS, NF, NTR override the grid.
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
    from qml_cutensornet_tpu.cli import classical_main, main as qmain
    from qml_cutensornet_tpu.utils.naming import run_info

    nf = int(os.environ.get("NF", "50"))
    ntr = int(os.environ.get("NTR", "200"))
    seeds = [int(s) for s in os.environ.get("SEEDS", "5 8 20 25 30 35").split()]
    ds = [int(d) for d in os.environ.get("DS", "1 2 4 6").split()]
    gammas = [float(g) for g in os.environ.get("GAMMAS", "0.1 0.5 1.0").split()]
    df = "elliptic_preproc.csv"

    (HERE / "raw" / "gaussian").mkdir(parents=True, exist_ok=True)
    (HERE / "raw" / "quantum").mkdir(parents=True, exist_ok=True)
    if not (ROOT / "datasets" / df).exists():
        from qml_cutensornet_tpu.cli import make_synthetic

        make_synthetic.main(["make_synthetic.py", "2000"])

    for s in seeds:
        gout = HERE / "raw" / "gaussian" / f"seed_{s}.npy"
        if not gout.exists():
            classical_main.main(
                ["classical_main.py", str(nf), str(ntr), str(ntr), str(s), df, str(gout)]
            )
            print(f"[table2] gaussian seed {s} done", flush=True)

    total = len(seeds) * len(ds) * len(gammas)
    i = 0
    for s in seeds:
        for d in ds:
            for g in gammas:
                i += 1
                info = run_info("test", nf, 2, g, d, ntr, s, df)
                if (HERE / "raw" / "quantum" / f"{info}.npy").exists():
                    print(f"[table2] {i}/{total} skip s{s} d{d} g{g}", flush=True)
                    continue
                t0 = time.perf_counter()
                qmain.main(
                    ["main.py", "TPU", str(nf), "2", str(g), str(d), str(ntr),
                     str(ntr), str(s), df]
                )
                for kind in ("train", "test"):
                    ri = run_info(kind, nf, 2, g, d, ntr, s, df)
                    src = ROOT / "data" / f"{ri}.npy"
                    if src.exists():
                        shutil.move(str(src), str(HERE / "raw" / "quantum" / f"{ri}.npy"))
                    for junk in (ROOT / f"{ri}.json", ROOT / "kernels" / f"{ri}.npy"):
                        junk.unlink(missing_ok=True)
                print(
                    f"[table2] {i}/{total} s{s} d{d} g{g}: "
                    f"{time.perf_counter() - t0:.1f} s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
