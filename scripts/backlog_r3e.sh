#!/usr/bin/env bash
# Round-3 on-chip backlog, batch e: remaining VERDICT sweep items.
#   1. crossover CPU-criterion d10 (chi cap 512)
#   2. bench brick chi192 (retry: transient tunnel error in batch d)
#   3. unfused-split control arms at chi128/chi256 (batch d ran both arms
#      with the new fused default ON, so the pairs were identical)
#   4. mem_evol d12 x=1..7 at QMLTPU_CHI=1024 (the CPU hedge ran at the
#      nf-default chi=64 and under-reports the d12 footprint 50x)
#   5. table2 full reference grid (6 seeds x d{1,2,4,6} x gamma{.1,.5,1})
# Serial: one process at a time through the tunnel. Every stage is under
# `timeout` so a wedged tunnel cannot stall the queue forever.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_e.log
SD=/tmp/backlog_stages_e
mkdir -p "$SD" runs/crossover/raw/cpu runs/mem_evol/raw/d12

log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

bench_stage() { # name timeout env...
    local name=$1 tmo=$2; shift 2
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

# --- 1. crossover CPU-criterion d10 ---------------------------------
log "crossover CPU d10 prewarm"
timeout 3600 env QMLTPU_CHI=512 QMLTPU_SIM_BATCH=10 \
    python -m qml_cutensornet_tpu.cli.main_no_test CPU 100 2 1.0 10 5 5 5 \
    elliptic_preproc.csv > "$SD/xover_cpu_d10_warm.out" 2> "$SD/xover_cpu_d10_warm.err" \
    || { log "prewarm FAILED rc=$?"; tail -4 "$SD/xover_cpu_d10_warm.err" >> "$LOG"; }
rm -f train_Nf*.npy train_Nf*.json kernels/train_Nf*.npy 2>/dev/null
log "crossover CPU d10 measured run"
if timeout 3600 env QMLTPU_CHI=512 QMLTPU_SIM_BATCH=10 \
    python -m qml_cutensornet_tpu.cli.main_no_test CPU 100 2 1.0 10 5 5 5 \
    elliptic_preproc.csv > "$SD/xover_cpu_d10.out" 2> "$SD/xover_cpu_d10.err"; then
    mv -f train_Nf*.json runs/crossover/raw/cpu/ 2>/dev/null
    rm -f train_Nf*.npy kernels/train_Nf*.npy 2>/dev/null
    log "crossover CPU d10 OK"
else
    log "FAILED xover_cpu_d10 rc=$?"; tail -4 "$SD/xover_cpu_d10.err" >> "$LOG"
fi

# --- 2+3. bench A/B arms ---------------------------------------------
bench_stage bench_brick_chi192   2400 QMLTPU_ROUTING=brick BENCH_CHI=192
bench_stage bench_unfused_chi128 1800 QMLTPU_FUSED_SPLIT=0 BENCH_CHI=128
bench_stage bench_unfused_chi256 2400 QMLTPU_FUSED_SPLIT=0 BENCH_CHI=256

# --- 4. mem_evol d12 x=1..7 at chi 1024 ------------------------------
for x in 1 2 3 4 5 6 7; do
    log "mem_evol d12 x=$x (chi 1024)"
    if timeout 5400 env QMLTPU_CHI=1024 \
        python -m qml_cutensornet_tpu.cli.main_track_mem TPU 100 2 1.0 12 5 5 5 \
        elliptic_preproc.csv "$x" \
        > "$SD/memevol_d12_$x.out" 2> "/tmp/memevol_d12_$x.err"; then
        mv -f "/tmp/memevol_d12_$x.err" "runs/mem_evol/raw/d12/$x.out"
        log "mem_evol d12 x=$x OK ($(grep -c 'MPS size' runs/mem_evol/raw/d12/$x.out) lines)"
    else
        log "FAILED memevol_d12_$x rc=$?"; tail -4 "/tmp/memevol_d12_$x.err" >> "$LOG"
    fi
done

# --- 5. table2 full grid (resumable; skips existing raw outputs) -----
log "table2 full grid start"
if timeout 21600 env SEEDS="5 8 20 25 30 35" \
    python runs/table2/sweep_inproc.py > "$SD/table2.out" 2> "$SD/table2.err"; then
    log "table2 grid OK"
else
    log "FAILED table2 rc=$?"; tail -6 "$SD/table2.err" >> "$LOG"
fi

log "BACKLOG E COMPLETE"
