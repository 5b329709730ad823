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

# Appended while batch i waits: phase-2b (fused brick pair update) A/B.
# 32q bench control = bench_brick_chi128 (16.13 s, batch d); nf=100 d6
# control = brick_caps0_chi128 (2.26 s/circ, batch c).
bench_stage bench_gatebrick_chi128 2400 QMLTPU_ROUTING=brick \
    QMLTPU_FUSED_GATE=1 BENCH_CHI=128

brick_gate_ab() { # <tag> <extra envs...>
    local tag="$1"; shift
    [ -s "runs/perf_ab/$tag.json" ] && { log "skip $tag"; return 0; }
    log "brick gate A/B $tag"
    local envs=(QMLTPU_ROUTING=brick QMLTPU_CHI=128 QMLTPU_SIM_BATCH=10 "$@")
    timeout 3600 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
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
brick_gate_ab brick_gate1_chi128 QMLTPU_FUSED_GATE=1
brick_gate_ab brick_gate1_blk25_chi128 QMLTPU_FUSED_GATE=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

log "BACKLOG I (appended phase-2b stages) COMPLETE"
