#!/usr/bin/env bash
# Round-3 on-chip backlog, batch k (waits for batch l): A/B of the
# block-2 within-panel BCGS2 (QMLTPU_MGS_PAIR) — halves the serial column
# chain the profiles blame for per-op latency. New kernel bodies = fresh
# Mosaic compiles, so each config gets a 7200 s cold stage (persistent
# cache) + an 1800 s warm record. If batch j's budgets won, the combined
# stage is the candidate production config.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_k.log
SD=/tmp/backlog_stages_k
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_l.pid ]; then
    log "waiting for batch l (pid $(cat /tmp/backlog_l.pid))"
    tail --pid="$(cat /tmp/backlog_l.pid)" -f /dev/null 2>/dev/null
fi
log "batch l done; starting batch k"

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

bench_stage bench_pair_cold        7200 QMLTPU_MGS_PAIR=1
bench_stage bench_pair             1800 QMLTPU_MGS_PAIR=1
bench_stage bench_pair_chi128_cold 7200 QMLTPU_MGS_PAIR=1 BENCH_CHI=128
bench_stage bench_pair_chi128      1800 QMLTPU_MGS_PAIR=1 BENCH_CHI=128
bench_stage bench_pair_chi256_cold 7200 QMLTPU_MGS_PAIR=1 BENCH_CHI=256
bench_stage bench_pair_chi256      1800 QMLTPU_MGS_PAIR=1 BENCH_CHI=256
# Candidate combined production config (budgets + pair) at chi128:
bench_stage bench_pairblk25_chi128_cold 7200 QMLTPU_MGS_PAIR=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pairblk25_chi128 1800 QMLTPU_MGS_PAIR=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

log "BACKLOG K COMPLETE"
