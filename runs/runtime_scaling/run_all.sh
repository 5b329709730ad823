#!/usr/bin/env bash
# Weak-scaling sweep of the train-Gram build (reference:
# runs/runtime_scaling/run_all.sh — nf=165, r2, g0.1, d1; 200..3200 points
# per class over 2..32 GPUs via Slurm). Here device counts come from
# QMLTPU_MESH; on a single-chip host use MESHES="1" or a virtual CPU mesh
# (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).
set -e
nf=${NF:-165}
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

for mesh in ${MESHES:-1 2 4 8}; do
    ntr=$((${NTR_BASE:-100} * mesh))
    # Prewarm: the compiled programs are dataset-size independent (fixed
    # chunk/tile shapes), so a small run populates the persistent XLA cache
    # and the recorded run below is warm — steady-state timing, like the
    # reference's native backends which have no JIT compile. PREWARM=0
    # disables.
    if [ "${PREWARM:-1}" = "1" ]; then
        QMLTPU_MESH=$mesh python -m qml_cutensornet_tpu.cli.main_no_test "TPU" $nf $r $g $d 16 16 $s $df
        rm -f kernels/train_Nf*.npy train_Nf*.npy train_Nf*.json 2>/dev/null || true
    fi
    QMLTPU_MESH=$mesh python -m qml_cutensornet_tpu.cli.main_no_test "TPU" $nf $r $g $d $ntr $ntr $s $df
    # Keep the parseable run-info name; the _m suffix lands in the dataset
    # field, which to_csv treats as free text.
    for j in train_Nf*.json; do mv "$j" "runs/runtime_scaling/raw/${j%.json}_m${mesh}.json"; done
    rm -f kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null || true
done
