#!/usr/bin/env bash
# Dataset provenance bump (round 5, EXECUTED): v1 (dense Gaussian) -> v2
# (cluster-prototype, see utils/data.make_synthetic_elliptic docstring).
#
# Final design (differs from the first draft of this script):
#   - datasets/elliptic_bitcoin_dataset      = v2 (canonical; science suites)
#   - datasets/elliptic_preproc.csv          = v2 preproc
#   - datasets/elliptic_bitcoin_dataset_v1   = archived v1 raw CSVs
#   - datasets/elliptic_preproc_bench.csv    = v1 preproc — the PERF
#     workload (bench.py, perf_ab A/Bs, crossover, make_golden) stays
#     pinned here: v2 collapses the bench avg chi 53.7 -> 11.7, and
#     v2-style tied data exposes a TPU large-chi numerics class
#     (docs/PARITY.md "Degenerate-spectrum data") that would pollute
#     parity columns. The committed golden is v1-computed and UNCHANGED.
#
# Re-running this script reproduces that end state from a v1 checkout.
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
preprocess_elliptic(dataset_dir="datasets/elliptic_bitcoin_dataset_v1",
                    out_csv="datasets/elliptic_preproc_bench.csv")
print("v1 bench preproc regenerated")
EOF

echo "== golden is v1-pinned and untouched; verifying it matches the bench dataset"
python - <<'EOF'
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from qml_cutensornet_tpu.utils.data import load_and_prepare
gold = np.load("runs/golden/bench_nq32_r2_d6_g1.0_N8.npz")
X, _, _, _ = load_and_prepare("datasets/elliptic_preproc_bench.csv", 32, 64, 64, 5)
assert np.allclose(gold["x"], X[:8]), "bench dataset no longer matches the golden"
print("golden <-> bench dataset consistent")
EOF
echo "== swap complete"
