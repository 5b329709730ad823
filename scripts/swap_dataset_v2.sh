#!/usr/bin/env bash
# Dataset provenance bump: v1 (dense Gaussian) -> v2 (cluster-prototype,
# see utils/data.make_synthetic_elliptic docstring). Archives the v1 raw
# CSVs (the committed runtime-suite rows — crossover, qubit_scaling,
# runtime_scaling, mem_evol — were measured on v1 and stay reproducible
# from the archive), regenerates the canonical dataset + preproc CSV, and
# rebuilds the committed f64 bench golden against the new features.
# Run from the repo root. CPU-only (golden uses the native C++ engine).
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

V1=datasets/elliptic_bitcoin_dataset_v1
if [ ! -d "$V1" ]; then
    echo "== archiving v1 raw CSVs to $V1"
    cp -r datasets/elliptic_bitcoin_dataset "$V1"
fi

echo "== regenerating canonical dataset (generator v2, seed 0)"
python - <<'EOF'
from qml_cutensornet_tpu.utils.data import make_synthetic_elliptic, preprocess_elliptic
make_synthetic_elliptic(force=True)
df = preprocess_elliptic()
print("v2 preproc rows:", len(df), "illicit:", int((df['Class'] == 0).sum()))
EOF

echo "== regenerating bench f64 golden (native C++ engine, ~15 min CPU)"
time python scripts/make_golden.py

echo "== bench-golden sanity vs the f32 CPU engine (quick block)"
python - <<'EOF'
import numpy as np
gold = np.load("runs/golden/bench_nq32_r2_d6_g1.0_N8.npz")
print("golden block:", gold["k"].shape, "min_fid:", float(gold["min_fid"]),
      "diag:", np.round(np.diag(gold["k"]), 6))
# The golden must itself be untruncated (raise GOLD_CHI if this fires —
# the v2 data's saturated rank may differ from v1's).
assert float(gold["min_fid"]) > 1 - 1e-9, "golden truncated; raise GOLD_CHI"
EOF
echo "== swap complete; run tests + commit next"
