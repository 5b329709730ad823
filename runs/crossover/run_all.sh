#!/usr/bin/env bash
# Backend-crossover sweep (reference: runs/crossover/run_all.sh — nf=100,
# r2, gamma 1.0, d in 2..12, both backends). Here both truncation-criterion
# modes of the TPU engine stand in for the two reference backends.
set -e
nf=${NF:-100}
ntr=5
r=2
g=1.0
s=5
df="elliptic_preproc.csv"

cd "$(dirname "$0")"
mkdir -p raw/cpu raw/gpu
cd ../..
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic

for d in ${DS:-2 4 6 8 10}; do
    QMLTPU_CHI=${QMLTPU_CHI:-512} python -m qml_cutensornet_tpu.cli.main_no_test "CPU" $nf $r $g $d $ntr $ntr $s $df
done
mv train_Nf*.json runs/crossover/raw/cpu/; rm -f train_Nf*.npy

for d in ${DS:-2 4 6 8 10 12}; do
    QMLTPU_CHI=${QMLTPU_CHI:-1024} python -m qml_cutensornet_tpu.cli.main_no_test "GPU" $nf $r $g $d $ntr $ntr $s $df
done
mv train_Nf*.json runs/crossover/raw/gpu/; rm -f train_Nf*.npy
