#!/usr/bin/env bash
# Table III sweep (reference: runs/table3/run_all.sh — AUC vs circuit depth
# r in {2,4,8,12,16,20} at nf=50, d=1, gamma=1.0, 6 seeds).
set -e
nf=${NF:-50}
ntr=${NTR:-200}
d=1
g=1.0
df="elliptic_preproc.csv"

cd "$(dirname "$0")"
mkdir -p raw/
cd ../..
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic 2000

for s in ${SEEDS:-5 8 20 25 30 35}; do
for r in ${RS:-2 4 8 12 16 20}; do
    python -m qml_cutensornet_tpu.cli.main "TPU" $nf $r $g $d $ntr $ntr $s $df
done
done
mv data/train_Nf${nf}_* data/test_Nf${nf}_* runs/table3/raw/ 2>/dev/null || true
rm -f train_Nf*.json test_Nf*.json
