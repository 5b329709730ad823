#!/usr/bin/env bash
# AUC-vs-qubits figure sweep (reference: runs/qml_figures/run_all.sh —
# nf in {15,50,100,165} x data sizes {300,1500,6400}, r2 g0.1 d1, full
# train+test pipeline; the metric .npy dumps feed plot.py).
set -e
r=2
g=0.1
d=1
s=5
df="elliptic_preproc.csv"

cd "$(dirname "$0")"
mkdir -p raw/
cd ../..
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic 8000

for ntr in ${NTRS:-150 750 3200}; do
for nf in ${NFS:-15 50 100 165}; do
    python -m qml_cutensornet_tpu.cli.main "TPU" $nf $r $g $d $ntr $ntr $s $df
done
done
mv data/train_Nf* data/test_Nf* runs/qml_figures/raw/ 2>/dev/null || true
rm -f train_Nf*.json test_Nf*.json
