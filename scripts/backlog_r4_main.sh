#!/usr/bin/env bash
# Round-4 on-chip MAIN chain — replaces the l/k/j/m cold+warm ladder after
# batch i's data came in (fused-gate lost 4/4 standalone, and bench.py
# already reports the warm-after-cold number in ONE process, so separate
# *_cold stages were pure duplication). Single stage per config, generous
# timeout to absorb fresh Mosaic compiles into the persistent cache.
# Ordered by information value per chip-minute:
#   1. smoke stamp + negative selftest (fast, gates everything).
#   2. serial-column latency levers at chi64 (the headline config):
#      pair, blk25 budgets, pair+blk25.
#   3. same at chi128; chunk-length A/B; the gate-redemption pair
#      (gate+blk25, triple) — gate's one plausible failure mode is
#      grid-block replay, which budgets attack.
#   4. chi256 ladder (verdict item 3) + brick flagship pair.
#   5. brick chi192 budget pathology stage.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r4main.log
SD=/tmp/backlog_stages_r4main
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }
log "starting r4 main chain"

# --- 1. smoke stamp + selftest ------------------------------------------
timeout 3600 python scripts/tpu_smoke.py --ensure > "$SD/smoke.out" 2>&1 \
    && log "smoke --ensure OK" || log "smoke --ensure FAILED rc=$?"
if [ ! -f "$SD/selftest.done" ]; then
    if timeout 3600 python scripts/tpu_smoke.py --selftest > "$SD/selftest.out" 2>&1; then
        log "smoke --selftest PASS (abort class caught)"; touch "$SD/selftest.done"
    else
        log "smoke --selftest FAILED rc=$?"; tail -4 "$SD/selftest.out" >> "$LOG"
    fi
fi

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

# --- 2. levers at chi64 (headline config; ctrl = 2.59 s) ----------------
bench_stage bench_pair             3600 QMLTPU_MGS_PAIR=1
bench_stage bench_blk25            3600 QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pairblk25_chi64  3600 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

# --- 3. chi128 levers (ctrl = 7.40 s), chunk A/B, gate redemption -------
bench_stage bench_pair_chi128      3600 QMLTPU_MGS_PAIR=1 BENCH_CHI=128
bench_stage bench_blk25_chi128     3600 QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6 BENCH_CHI=128
bench_stage bench_pairblk25_chi128 3600 QMLTPU_MGS_PAIR=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_chunk384         3600 QMLTPU_CHUNK_LEN=384
bench_stage bench_chunk1152        3600 QMLTPU_CHUNK_LEN=1152
bench_stage bench_gate_blk25_chi128 5400 QMLTPU_FUSED_GATE=1 BENCH_CHI=128 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_triple_chi128    5400 QMLTPU_FUSED_GATE=1 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6 BENCH_CHI=128

# --- 4. chi256 ladder (ctrl = 32.2 s) + brick flagship pair -------------
bench_stage bench_pair_chi256      5400 QMLTPU_MGS_PAIR=1 BENCH_CHI=256
bench_stage bench_blk25_chi256     5400 BENCH_CHI=256 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pairblk25_chi256 5400 QMLTPU_MGS_PAIR=1 BENCH_CHI=256 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

brick_ab() { # <tag> <extra envs...>  (flagship nf=100 d6; ctrl 2.26 s/circ)
    local tag="$1"; shift
    [ -s "runs/perf_ab/$tag.json" ] && { log "skip $tag"; return 0; }
    log "brick A/B $tag"
    local envs=(QMLTPU_ROUTING=brick QMLTPU_CHI=128 QMLTPU_SIM_BATCH=10 "$@")
    timeout 5400 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
        TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv \
        > "$SD/$tag.prewarm.out" 2>&1 || { log "FAILED $tag prewarm"; return 0; }
    rm -f train_Nf*.json kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null
    timeout 1800 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
        TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv \
        > "$SD/$tag.out" 2>&1 || { log "FAILED $tag record"; return 0; }
    for j in train_Nf*.json; do
        [ -f "$j" ] && mv "$j" "runs/perf_ab/$tag.json"
    done
    rm -f kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null
    python - "$tag" >> "$LOG" <<'PYEOF'
import json, sys
rec = json.load(open(f"runs/perf_ab/{sys.argv[1]}.json"))
print(sys.argv[1], {k: rec.get(k) for k in ("avg_circ_sim", "median_circ_sim", "ave max chi x", "avg_fidelity")})
PYEOF
}
brick_ab brick_pair_chi128 QMLTPU_MGS_PAIR=1

# --- 5. brick chi192 budget pathology (ctrl 219 s; one long stage) ------
bench_stage bench_brick192_blk25 7200 QMLTPU_ROUTING=brick BENCH_CHI=192 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

log "R4 MAIN CHAIN COMPLETE"
