#!/usr/bin/env bash
# Qubit-scaling sweep (reference: runs/qubit_scaling/run_all.sh — nf in
# 30..165, gamma in {0.1, 0.5, 1.0}, r2 d6, 5+5 points, train Gram only).
# Override the sweep with env vars for quick runs: NFS, GAMMAS, NTR.
set -e
ntr=${NTR:-5}
d=${D:-6}
r=2
s=5
df="elliptic_preproc.csv"

cd "$(dirname "$0")"
mkdir -p raw/
cd ../..
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic

for nf in ${NFS:-30 60 90 120 150 165}; do
# Prewarm once per nf (programs are shared across gamma and dataset size;
# only the qubit count changes shapes). PREWARM=0 disables.
# NOTE: cleanups are nf-SPECIFIC and each nf's records move to raw/
# immediately — a global "rm train_Nf*.json" here once deleted the
# previous nf's freshly recorded JSONs.
if [ "${PREWARM:-1}" = "1" ]; then
    python -m qml_cutensornet_tpu.cli.main_no_test "TPU" $nf $r 1.0 $d $ntr $ntr $s $df
    rm -f kernels/train_Nf${nf}_*.npy train_Nf${nf}_*.npy train_Nf${nf}_*.json 2>/dev/null || true
fi
for g in ${GAMMAS:-0.1 0.5 1.0}; do
    python -m qml_cutensornet_tpu.cli.main_no_test "TPU" $nf $r $g $d $ntr $ntr $s $df
done
mv train_Nf${nf}_*.json runs/qubit_scaling/raw/
rm -f kernels/train_Nf${nf}_*.npy train_Nf${nf}_*.npy
done
