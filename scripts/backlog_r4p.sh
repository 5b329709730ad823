#!/usr/bin/env bash
# Round-4 PRIORITIZED continuation (replaces the r4_main tail after the
# chi64 lever data came in: pair LOST standalone at chi64 — 3.63 s vs
# 2.59 ctrl — so pairblk25_chi64 is deprioritized; the remaining chip
# minutes go to (1) the tile-scan site-block A/B at the headline config,
# (2) the chi128 composed-lever stage where the serial-column wall
# actually lives, (3) single-lever chi128 arms, then cheap chunk A/Bs.
# Idempotent: stages skip when banked in runs/perf_ab/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r4p.log
SD=/tmp/backlog_stages_r4p
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }
log "starting r4p prioritized chain"

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

# 1. Tile-scan site-block at the headline config (XLA-only recompile of
#    the tile program — cheap; tiles are 0.63 s of the 2.59 s wall).
bench_stage bench_tileblk2         3600 QMLTPU_TILE_BLOCK=2
# 2. The chi128 composed-lever stage (grid 13->3 blocks AND halved
#    chains; DESIGN.md predicts 0.0828 -> ~0.01 s/op).
bench_stage bench_pairblk25_chi128 5400 QMLTPU_MGS_PAIR=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
# 3. Single-lever chi128 arms for attribution.
bench_stage bench_blk25_chi128     5400 QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6 BENCH_CHI=128
bench_stage bench_pair_chi128      5400 QMLTPU_MGS_PAIR=1 BENCH_CHI=128
# 4. Cheap XLA-only A/Bs.
bench_stage bench_tileblk4         3600 QMLTPU_TILE_BLOCK=4
bench_stage bench_tileblk2_chi128  3600 QMLTPU_TILE_BLOCK=2 BENCH_CHI=128
bench_stage bench_chunk384         3600 QMLTPU_CHUNK_LEN=384
bench_stage bench_chunk1152        3600 QMLTPU_CHUNK_LEN=1152
# 5. If time remains: chi64 composed arm, gate redemption, chi256 ladder.
bench_stage bench_pairblk25_chi64  3600 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_gate_blk25_chi128 5400 QMLTPU_FUSED_GATE=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pair_chi256      5400 QMLTPU_MGS_PAIR=1 BENCH_CHI=256
bench_stage bench_blk25_chi256     5400 BENCH_CHI=256 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

log "R4P CHAIN COMPLETE"
