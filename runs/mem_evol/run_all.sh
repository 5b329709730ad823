#!/usr/bin/env bash
# Memory-evolution capture (reference: runs/mem_evol/run_all.sh — one
# datapoint circuit per run at nf=100, d in {6,12}; per-gate MPS sizes
# parsed from stderr).
set -e
nf=${NF:-100}
ntr=5
r=2
g=1.0
s=5
df="elliptic_preproc.csv"

cd "$(dirname "$0")"
for d in ${DS:-6 12}; do mkdir -p "raw/d$d"; done
cd ../..
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic

for d in ${DS:-6 12}; do
for x in ${XS:-0 1 2 3 4 5 6 7}; do
    python -m qml_cutensornet_tpu.cli.main_track_mem "TPU" $nf $r $g $d $ntr $ntr $s $df $x \
        2> runs/mem_evol/raw/d$d/$x.out
done
done
