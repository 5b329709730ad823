#!/usr/bin/env bash
# Table II sweep (reference: runs/table2/run_all.sh — nf=50, 200+200 points,
# r2; quantum kernels over d x gamma x 6 seeds vs the Gaussian baseline).
set -e
nf=${NF:-50}
ntr=${NTR:-200}
r=2
df="elliptic_preproc.csv"

cd "$(dirname "$0")"
mkdir -p raw/gaussian raw/quantum
cd ../..
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic 2000

for s in ${SEEDS:-5 8 20 25 30 35}; do
  python -m qml_cutensornet_tpu.cli.classical_main $nf $ntr $ntr $s $df "runs/table2/raw/gaussian/seed_${s}.npy"
done

for s in ${SEEDS:-5 8 20 25 30 35}; do
for d in ${DS:-1 2 4 6}; do
for g in ${GAMMAS:-0.1 0.5 1.0}; do
    python -m qml_cutensornet_tpu.cli.main "TPU" $nf $r $g $d $ntr $ntr $s $df
done
done
done
mv data/train_Nf${nf}_* data/test_Nf${nf}_* runs/table2/raw/quantum/ 2>/dev/null || true
rm -f train_Nf*.json test_Nf*.json
