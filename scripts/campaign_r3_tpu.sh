#!/usr/bin/env bash
# Round-3 on-chip campaign: brick-engine timing at nf=100 d6 (VERDICT item
# 2) and the large-chi crossover d=10/12 (item 1). Run stages separately:
#   scripts/campaign_r3_tpu.sh brick100   # brick vs tracked at nf=100 d6
#   scripts/campaign_r3_tpu.sh d10        # crossover d=10, chi 512
#   scripts/campaign_r3_tpu.sh d12        # crossover d=12, chi 1024
# Profiling JSONs land in runs/crossover/raw/gpu/ with the standard
# run-info names; to_csv.py turns them into gpu_results.csv rows.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic

run() { # run <tag> <env...> -- <cli args...>
    local tag="$1"; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "== $tag (prewarm) =="
    env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test "$@" || return 1
    rm -f train_Nf*.json kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null || true
    echo "== $tag (record) =="
    env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test "$@"
    mkdir -p runs/crossover/raw/gpu
    for j in train_Nf*.json; do
        [ -f "$j" ] || continue
        mv "$j" "runs/crossover/raw/gpu/${j%.json}_${tag}.json"
        echo "-> runs/crossover/raw/gpu/${j%.json}_${tag}.json"
    done
    rm -f kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null || true
}

case "${1:-all}" in
brick100)
    # Item 2 gate: per-circuit sim >= 2x better than the round-2 5.75 s
    # (tracked, chi 192 staged). Reference to beat: 29.8 s (A100 d=6).
    run tracked_chi192 QMLTPU_CHI=192 QMLTPU_SIM_BATCH=10 -- TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv
    run brick_chi128 QMLTPU_ROUTING=brick QMLTPU_CHI=128 QMLTPU_SIM_BATCH=10 -- TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv
    run brick_chi192 QMLTPU_ROUTING=brick QMLTPU_CHI=192 QMLTPU_SIM_BATCH=10 -- TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv
    ;;
d10)
    # Reference: 108.6 s/circuit, avg chi 320.1 (A100, crossover d=10).
    run tracked_chi512_d10 QMLTPU_CHI=512 QMLTPU_SIM_BATCH=5 QMLTPU_TILE=10 -- TPU 100 2 1.0 10 5 5 5 elliptic_preproc.csv
    ;;
d10brick)
    run brick_chi512_d10 QMLTPU_ROUTING=brick QMLTPU_CHI=512 QMLTPU_SIM_BATCH=5 QMLTPU_TILE=10 -- TPU 100 2 1.0 10 5 5 5 elliptic_preproc.csv
    ;;
d12)
    # Reference: 237.3 s/circuit, avg chi 595.6 (A100, crossover d=12).
    # chi cap 512 first: staged-chi stage sets are STRUCTURAL (they ramp
    # to the cap whatever the data does), while the synthetic dataset
    # tracks well below the Elliptic chi at equal d (d10: avg 183 vs ref
    # 320) — so 512 is expected non-binding here AND every chunk-body
    # shape is warm from the d10 run. Escalate to d12x1024 only if the
    # recorded max chi saturates the cap.
    run tracked_chi512_d12 QMLTPU_CHI=512 QMLTPU_SIM_BATCH=5 QMLTPU_TILE=10 -- TPU 100 2 1.0 12 5 5 5 elliptic_preproc.csv
    ;;
d12x1024)
    # chi=1024 needs sim_batch=1: at batch 2 the scan carry's state
    # double-buffer plus theta/QR temps exceed HBM (measured OOM).
    # tile=5: at chi-bucket ~640+ a 10-state tile block's host->HBM upload
    # would not leave room for the contraction temps.
    run tracked_chi1024_d12 QMLTPU_CHI=1024 QMLTPU_SIM_BATCH=1 QMLTPU_TILE=5 -- TPU 100 2 1.0 12 5 5 5 elliptic_preproc.csv
    ;;
d12brick)
    run brick_chi1024_d12 QMLTPU_ROUTING=brick QMLTPU_CHI=1024 QMLTPU_SIM_BATCH=2 QMLTPU_TILE=5 -- TPU 100 2 1.0 12 5 5 5 elliptic_preproc.csv
    ;;
*)
    echo "usage: $0 {brick100|d10|d10brick|d12|d12brick}" >&2
    exit 2
    ;;
esac
