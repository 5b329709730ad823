"""Qubit-scaling sweep, in-process (reference: runs/qubit_scaling/run_all.sh
— nf in 30..165, gamma in {0.1, 0.5, 1.0}, r2 d6, 5+5 points, train only).

One process per nf GROUP instead of one per run: the three gamma records
share every compiled program (gamma enters as runtime angles), so the
per-process program-load cost through the AOT tunnel is paid once per nf.
Each record moves to raw/ immediately and existing records are skipped —
resumable after tunnel hiccups without losing the prewarm investment.

Env: NFS, GAMMAS, NTR, D, PREWARM=0. Per-nf bond caps follow the sweep's
existing records (64 up to nf=90; 128 at 120/150 so the eps-mask, not the
cap, sets the reported chi; 192 at nf=165 as recorded in round 2) unless
QMLTPU_CHI is set explicitly.
"""

from __future__ import annotations

import os
import pathlib
import shutil
import time

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parent.parent

CHI_FOR_NF = {30: 64, 60: 64, 90: 64, 120: 128, 150: 128, 165: 192}


def main() -> None:
    os.chdir(ROOT)
    import sys

    sys.path.insert(0, str(ROOT))
    from qml_cutensornet_tpu.cli import main_no_test
    from qml_cutensornet_tpu.utils.naming import run_info

    ntr = int(os.environ.get("NTR", "5"))
    d = int(os.environ.get("D", "6"))
    nfs = [int(x) for x in os.environ.get("NFS", "30 60 90 120 150 165").split()]
    gammas = [float(g) for g in os.environ.get("GAMMAS", "0.1 0.5 1.0").split()]
    prewarm = os.environ.get("PREWARM", "1") == "1"
    chi_env = os.environ.get("QMLTPU_CHI")
    df = "elliptic_preproc.csv"
    s = 5

    (HERE / "raw").mkdir(exist_ok=True)
    if not (ROOT / "datasets" / df).exists():
        from qml_cutensornet_tpu.cli import make_synthetic

        make_synthetic.main(["make_synthetic.py"])

    os.environ.setdefault("QMLTPU_SIM_BATCH", "10")
    for nf in nfs:
        todo = [
            g
            for g in gammas
            if not (
                HERE / "raw" / (run_info("train", nf, 2, g, d, ntr, s, df) + ".json")
            ).exists()
        ]
        if not todo:
            print(f"[qs] nf={nf}: all {len(gammas)} records present, skip", flush=True)
            continue
        os.environ["QMLTPU_CHI"] = chi_env or str(CHI_FOR_NF.get(nf, 64))
        argv = lambda g: [
            "main_no_test.py", "TPU", str(nf), "2", str(g), str(d), str(ntr),
            str(ntr), str(s), df,
        ]
        if prewarm:
            t0 = time.perf_counter()
            main_no_test.main(argv(1.0))
            ri = run_info("train", nf, 2, 1.0, d, ntr, s, df)
            (ROOT / f"{ri}.json").unlink(missing_ok=True)
            (ROOT / "kernels" / f"{ri}.npy").unlink(missing_ok=True)
            print(f"[qs] nf={nf} prewarm: {time.perf_counter() - t0:.1f} s", flush=True)
        for g in todo:
            t0 = time.perf_counter()
            main_no_test.main(argv(g))
            ri = run_info("train", nf, 2, g, d, ntr, s, df)
            shutil.move(str(ROOT / f"{ri}.json"), str(HERE / "raw" / f"{ri}.json"))
            (ROOT / "kernels" / f"{ri}.npy").unlink(missing_ok=True)
            print(f"[qs] nf={nf} g={g}: {time.perf_counter() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
