#!/usr/bin/env bash
# Round-5 on-chip chain, stage A — work that must run on the ROUND-4
# (v1) dataset so its rows stay consistent with the suites they join:
#   1. qubit_scaling nf=165 g0.1 contaminated-row rerun (verdict weak #2).
#   2. chi128 lever arms for the serial-column wall attribution
#      (verdict next-step #1): tileblk2 (validates the k-aware tile
#      auto-size), pair, blk25, pair+blk25 composed.
#   3. crossover tracked chi1024 d12 (verdict next-step #2) — long; last.
# Stage B (new dataset: table2/table3/qml_figures) runs in backlog_r5b.sh
# AFTER the dataset provenance bump. Supersedes backlog_r4a/r4b/r4p —
# do not run those (duplicated bench stages would race on the bank files).
# Idempotent: stages skip when banked. Single-instance: /tmp/backlog_r5.pid.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r5a.log
SD=/tmp/backlog_stages_r5
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_r5.pid ] && kill -0 "$(cat /tmp/backlog_r5.pid)" 2>/dev/null; then
    log "another r5 chain is running (pid $(cat /tmp/backlog_r5.pid)); exiting"
    exit 1
fi
echo $$ > /tmp/backlog_r5.pid
log "starting r5 stage A"

bench_stage() { # name timeout env...
    local name=$1 tmo=$2; shift 2
    [ -s "runs/perf_ab/$name.json" ] && { log "skip $name (banked)"; return 0; }
    log "bench $name ($*)"
    if timeout "$tmo" env "$@" python bench.py \
        > "$SD/$name.out" 2> "$SD/$name.err"; then
        cp "$SD/$name.out" "runs/perf_ab/$name.json"
        grep -E "warm run|max_abs_err|avg_fidelity" "$SD/$name.err" \
            > "runs/perf_ab/$name.err.txt" || true
        cat "$SD/$name.out" >> "$LOG"
    else
        log "FAILED $name rc=$?"; tail -4 "$SD/$name.err" >> "$LOG"
    fi
}

# --- 1. qubit_scaling nf=165 g0.1 outlier rerun (warm) ----------------
QS_RAW=runs/qubit_scaling/raw/train_Nf165_r2_g0.1_p0.0_nn6_mslinear_Ntr5_s5_elliptic_preproc.json
if [ ! -f "$QS_RAW.redone" ]; then
    log "qubit_scaling nf=165 g0.1 rerun"
    # Prewarm the nf=165 shapes (g1.0 shares the programs), then record.
    timeout 5400 python -m qml_cutensornet_tpu.cli.main_no_test TPU 165 2 1.0 6 5 5 5 \
        elliptic_preproc.csv > "$SD/qs_prewarm.out" 2>&1 \
        || log "qs prewarm FAILED rc=$? (recording anyway)"
    rm -f train_Nf165_*.json kernels/train_Nf165_*.npy train_Nf165_*.npy 2>/dev/null
    if timeout 1800 python -m qml_cutensornet_tpu.cli.main_no_test TPU 165 2 0.1 6 5 5 5 \
        elliptic_preproc.csv > "$SD/qs_record.out" 2>&1; then
        mv train_Nf165_r2_g0.1_*.json "$QS_RAW"
        touch "$QS_RAW.redone"
        rm -f kernels/train_Nf165_*.npy train_Nf165_*.npy 2>/dev/null
        (cd runs/qubit_scaling && python to_csv.py && python plot.py) >> "$LOG" 2>&1
        log "qubit_scaling outlier rerun OK"
    else
        log "FAILED qubit_scaling rerun rc=$?"; tail -4 "$SD/qs_record.out" >> "$LOG"
    fi
else
    log "skip qubit_scaling rerun (banked)"
fi

# --- 2. chi128 lever arms ---------------------------------------------
# (round-5 mid-course trim: pair arms dropped after the decisive chi64
# standalone loss — 3.63 s vs 2.59 — and the blk25 chi64 WIN shipping as
# the default budget; blk25_chi128 stays to validate the new default in
# the chi128 regime.)
bench_stage bench_tileblk2_chi128  5400 BENCH_CHI=128
bench_stage bench_blk25_chi128     5400 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

# --- 3. crossover chi1024 d12 (long; sim_batch 1 — chi1024 at batch 2
#     OOMs the scan-carry double buffer). Runs on the V1 bench dataset
#     (elliptic_preproc_bench.csv = the archive the suite's other rows
#     were measured on; the v2 cluster data entangles far less and cannot
#     exercise the avg-chi~600 regime). Output renamed to the suite's
#     canonical row name; runs/crossover/README.md records the provenance.
name=train_Nf100_r2_g1.0_p0.0_nn12_mslinear_Ntr5_s5_elliptic_preproc
bname=train_Nf100_r2_g1.0_p0.0_nn12_mslinear_Ntr5_s5_elliptic_preproc_bench
if [ ! -s "runs/crossover/raw/gpu/${name}_tracked_chi1024.json" ]; then
    log "crossover tracked_chi1024_d12 (v1 bench dataset)"
    if timeout 14400 env QMLTPU_CHI=1024 QMLTPU_SIM_BATCH=1 \
        python -m qml_cutensornet_tpu.cli.main_no_test \
        TPU 100 2 1.0 12 5 5 5 elliptic_preproc_bench.csv \
        > "$SD/crossover_chi1024.out" 2>&1; then
        mv "${bname}.json" "runs/crossover/raw/gpu/${name}_tracked_chi1024.json" 2>/dev/null \
            || log "crossover chi1024: profiling JSON missing"
        rm -f kernels/train_Nf100_*.npy train_Nf100_*.npy 2>/dev/null
        (cd runs/crossover && python to_csv.py) >> "$LOG" 2>&1
        log "crossover chi1024 OK"
    else
        log "FAILED crossover chi1024 rc=$?"; tail -6 "$SD/crossover_chi1024.out" >> "$LOG"
    fi
else
    log "skip crossover chi1024 (banked)"
fi

rm -f /tmp/backlog_r5.pid
log "R5 STAGE A COMPLETE"
