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

# Per-distance bond cap: ~2x the reference's observed avg max chi at nf=100
# (runs/crossover gpu_results.csv: d2 10.1, d4 28.6, d6 71.9, d8 137.1,
# d10 320.1) so the eps-mask, not the cap, sets the reported chi.
chi_for_d() {
    case "$1" in
        1|2) echo 64 ;;
        3|4) echo 96 ;;
        5|6) echo 192 ;;
        7|8) echo 256 ;;
        9|10) echo 512 ;;
        *) echo 1024 ;;
    esac
}

for d in ${DS:-2 4 6 8 10}; do
    if [ "${PREWARM:-1}" = "1" ]; then
        QMLTPU_CHI=${QMLTPU_CHI:-$(chi_for_d $d)} QMLTPU_SIM_BATCH=${QMLTPU_SIM_BATCH:-10} \
            python -m qml_cutensornet_tpu.cli.main_no_test "CPU" $nf $r $g $d $ntr $ntr $s $df
        rm -f kernels/train_Nf*.npy train_Nf*.npy train_Nf*.json 2>/dev/null || true
    fi
    QMLTPU_CHI=${QMLTPU_CHI:-$(chi_for_d $d)} QMLTPU_SIM_BATCH=${QMLTPU_SIM_BATCH:-10} \
        python -m qml_cutensornet_tpu.cli.main_no_test "CPU" $nf $r $g $d $ntr $ntr $s $df
done
mv train_Nf*.json runs/crossover/raw/cpu/; rm -f train_Nf*.npy

for d in ${DS:-2 4 6 8 10 12}; do
    if [ "${PREWARM:-1}" = "1" ]; then
        QMLTPU_CHI=${QMLTPU_CHI:-$(chi_for_d $d)} QMLTPU_SIM_BATCH=${QMLTPU_SIM_BATCH:-10} \
            python -m qml_cutensornet_tpu.cli.main_no_test "GPU" $nf $r $g $d $ntr $ntr $s $df
        rm -f kernels/train_Nf*.npy train_Nf*.npy train_Nf*.json 2>/dev/null || true
    fi
    QMLTPU_CHI=${QMLTPU_CHI:-$(chi_for_d $d)} QMLTPU_SIM_BATCH=${QMLTPU_SIM_BATCH:-10} \
        python -m qml_cutensornet_tpu.cli.main_no_test "GPU" $nf $r $g $d $ntr $ntr $s $df
done
mv train_Nf*.json runs/crossover/raw/gpu/; rm -f train_Nf*.npy
