#!/usr/bin/env python3
"""Summarize the on-chip A/B ledger (runs/perf_ab/*.json) as a markdown table.

Two record shapes land in the ledger:

* ``bench_*.json`` — bench.py's one-line JSON (wall seconds in ``value``,
  plus parity/fidelity/TFLOP fields); the paired ``*.err.txt`` carries the
  warm-run line.
* ``brick_*.json`` / ``*_gate1_*.json`` — the profiling dict a CLI run
  writes (reference C15 schema, ``[value, unit]`` pairs): per-circuit sim
  time is the comparable number there.

Usage: ``python scripts/ab_verdicts.py [--csv]``. Intended to refresh the
tables in runs/perf_ab/README.md after a backlog batch completes.
"""

import argparse
import json
import pathlib
import sys

LEDGER = pathlib.Path(__file__).resolve().parent.parent / "runs" / "perf_ab"


def _fmt(v, nd=3):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:.{nd}g}" if (abs(v) < 1e-3 or abs(v) >= 1e4) else f"{v:.{nd}f}"
    return str(v)


def load_records():
    rows = []
    for path in sorted(LEDGER.glob("*.json")):
        if path.name == "profile_op.jsonl":
            continue
        try:
            rec = json.loads(path.read_text())
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        name = path.stem
        if "metric" in rec:  # bench.py one-liner
            rows.append({
                "name": name,
                "kind": "bench",
                "wall_s": rec.get("value"),
                "sim_s": rec.get("sim_seconds"),
                "parity": rec.get("max_abs_err_vs_f64_golden"),
                "fidelity": rec.get("avg_fidelity"),
                "vs_baseline": rec.get("vs_baseline"),
            })
        elif isinstance(rec, dict) and "avg_circ_sim" in rec:  # CLI profiling dict
            def val(k):
                v = rec.get(k)
                return v[0] if isinstance(v, (list, tuple)) else v
            rows.append({
                "name": name,
                "kind": "cli",
                "wall_s": val("total_time"),
                "sim_s": val("avg_circ_sim"),
                "parity": None,
                "fidelity": val("avg_fidelity"),
                "vs_baseline": None,
            })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", action="store_true", help="emit CSV instead of markdown")
    args = ap.parse_args()
    rows = load_records()
    if args.csv:
        print("name,kind,wall_s,sim_s,parity,fidelity,vs_baseline")
        for r in rows:
            print(",".join("" if r[k] is None else str(r[k])
                           for k in ("name", "kind", "wall_s", "sim_s",
                                     "parity", "fidelity", "vs_baseline")))
        return 0
    print("| record | wall s | sim s | parity | fidelity | vs A100 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        sim = r["sim_s"]
        sim_label = _fmt(sim) + ("/circ" if r["kind"] == "cli" else "")
        print(f"| {r['name']} | {_fmt(r['wall_s'])} | {sim_label} "
              f"| {_fmt(r['parity'], 2)} | {_fmt(r['fidelity'], 6)} "
              f"| {_fmt(r['vs_baseline'], 4)} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
