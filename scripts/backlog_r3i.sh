#!/usr/bin/env bash
# Round-3 on-chip backlog, batch i (waits for batch h) — REVISED after the
# batch-h budget stages timed out: a fresh-shape Pallas compile through
# the AOT tunnel measured 367 s (probe, 16:02), so any knob that changes
# EVERY kernel's block size (QMLTPU_*_BLOCK_BYTES) forces a full-engine
# recompile that cannot fit a 1800 s timeout. This batch:
#   1. mem_evol d12 retries for any x in 0..7 still missing (90 s settle
#      delay between attempts — the batch-e failures were the tunnel not
#      releasing the previous process's HBM yet).
#   2. Phase-2 fused gate split A/B (QMLTPU_FUSED_GATE) at chi 64/128,
#      tracked engine, timeout 3600 (all-new kernel shapes compile once,
#      then the persistent cache makes reruns warm).
#   3. Phase-2b fused brick pair update A/B at chi128 (32q bench + the
#      nf=100 d6 flagship config).
#   4. ONE long-timeout budget stage: brick chi192 under 25e6 budgets —
#      the motivating pathology (219 s from 71 grid blocks x serial
#      column scans); timeout 7200 absorbs the one-time recompile.
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
log "batch h done; starting batch i (revised)"

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

# --- 2./3. phase-2 and 2b fused gate A/B --------------------------------
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

bench_stage bench_gate_chi64       3600 QMLTPU_FUSED_GATE=1
bench_stage bench_gate_chi128      3600 QMLTPU_FUSED_GATE=1 BENCH_CHI=128
bench_stage bench_gatebrick_chi128 3600 QMLTPU_ROUTING=brick \
    QMLTPU_FUSED_GATE=1 BENCH_CHI=128

# nf=100 d6 flagship config (control: brick_caps0_chi128 = 2.26 s/circ).
brick_gate_ab() { # <tag> <extra envs...>
    local tag="$1"; shift
    [ -s "runs/perf_ab/$tag.json" ] && { log "skip $tag"; return 0; }
    log "brick gate A/B $tag"
    local envs=(QMLTPU_ROUTING=brick QMLTPU_CHI=128 QMLTPU_SIM_BATCH=10 "$@")
    timeout 4800 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
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

# --- 4. the one budget stage that answers the chi192 pathology ----------
bench_stage bench_brick192_blk25 7200 QMLTPU_ROUTING=brick BENCH_CHI=192 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

log "BACKLOG I (revised) COMPLETE"
