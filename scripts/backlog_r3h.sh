#!/usr/bin/env bash
# Round-3 on-chip backlog, batch h (waits for batch g): A/B of the Pallas
# batch-block budgets. Grid blocks run sequentially and each replays the
# serial per-column orthonormalization chain, so block size divides the
# op's latency share; 25e6 lifts the chi64 fused-split block 14 -> 50
# (grid 8 -> 2) within the 100 MB VMEM ceiling. Numerics-neutral by
# construction (batch elements are independent).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_h.log
SD=/tmp/backlog_stages_h
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_g.pid ]; then
    log "waiting for batch g (pid $(cat /tmp/backlog_g.pid))"
    tail --pid="$(cat /tmp/backlog_g.pid)" -f /dev/null 2>/dev/null
fi
log "batch g done; starting batch h"

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

bench_stage bench_ctrl_r3h       1800 BENCH_REPS=2
bench_stage bench_blk25          1800 QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_blkqr25        1800 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_blkfused25     1800 QMLTPU_FUSED_BLOCK_BYTES=25e6
bench_stage bench_blk25_chi128   1800 QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6 BENCH_CHI=128

log "BACKLOG H COMPLETE"

# Appended while waiting: brick chi192 with raised block budgets — the
# 219 s batch-e row is the blocked path's serial column scans at a
# 1700-element batch split into 71 grid blocks under the 5 MB default.
bench_stage bench_brick_chi192_blk25 2400 QMLTPU_ROUTING=brick BENCH_CHI=192 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
log "BACKLOG H (appended stages) COMPLETE"
