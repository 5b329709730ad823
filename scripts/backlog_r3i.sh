#!/usr/bin/env bash
# Round-3 on-chip backlog, batch i (waits for batch h):
#   1. mem_evol d12 retries for any x in 0..7 still missing — the batch-e
#      failures (x=2, likely x=4/6) were backend-level RESOURCE_EXHAUSTED
#      right after a successful run exited, i.e. the tunnel had not
#      released the previous process's HBM yet; a 90 s settle delay
#      between attempts is the fix under test.
#   2. Phase-2 fused gate+theta-build split A/B (QMLTPU_FUSED_GATE): alone
#      and combined with the raised Pallas block budgets from batch h, at
#      chi 64 and 128 (the kernel's eligible range).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_i.log
SD=/tmp/backlog_stages_i
mkdir -p "$SD" runs/mem_evol/raw/d12
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_h.pid ]; then
    log "waiting for batch h (pid $(cat /tmp/backlog_h.pid))"
    tail --pid="$(cat /tmp/backlog_h.pid)" -f /dev/null 2>/dev/null
fi
log "batch h done; starting batch i"

# --- 1. mem_evol d12 retries (missing x only, settle delay between) -----
for x in 0 1 2 3 4 5 6 7; do
    [ -f "runs/mem_evol/raw/d12/$x.out" ] && continue
    sleep 90  # let the tunnel release the previous process's HBM
    log "mem_evol d12 x=$x retry (chi 1024)"
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

# --- 2. phase-2 fused gate split A/B ------------------------------------
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

bench_stage bench_gate_chi64        1800 QMLTPU_FUSED_GATE=1
bench_stage bench_gate_blk25        1800 QMLTPU_FUSED_GATE=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_gate_chi128       1800 QMLTPU_FUSED_GATE=1 BENCH_CHI=128
bench_stage bench_gate_blk25_chi128 1800 QMLTPU_FUSED_GATE=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

log "BACKLOG I COMPLETE"
