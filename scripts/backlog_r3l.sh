#!/usr/bin/env bash
# Round-3 on-chip backlog, batch l (waits for batch i): retry the phase-2
# and phase-2b fused-gate A/B stages that died in batch i on the Mosaic
# block-mapping bug (fixed in 7e908ee; tests/test_tpu_lowering.py now
# lowers every kernel family for TPU in CI). Fresh kernel bodies = fresh
# compiles through the slow AOT tunnel, so cold(7200)/warm(1800) pairs.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_l.log
SD=/tmp/backlog_stages_l
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_i.pid ]; then
    log "waiting for batch i (pid $(cat /tmp/backlog_i.pid))"
    tail --pid="$(cat /tmp/backlog_i.pid)" -f /dev/null 2>/dev/null
fi
log "batch i done; starting batch l"

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

bench_stage bench_gate_chi64_cold       7200 QMLTPU_FUSED_GATE=1
bench_stage bench_gate_chi64            1800 QMLTPU_FUSED_GATE=1
bench_stage bench_gate_chi128_cold      7200 QMLTPU_FUSED_GATE=1 BENCH_CHI=128
bench_stage bench_gate_chi128           1800 QMLTPU_FUSED_GATE=1 BENCH_CHI=128
bench_stage bench_gatebrick_chi128_cold 7200 QMLTPU_ROUTING=brick \
    QMLTPU_FUSED_GATE=1 BENCH_CHI=128
bench_stage bench_gatebrick_chi128      1800 QMLTPU_ROUTING=brick \
    QMLTPU_FUSED_GATE=1 BENCH_CHI=128

# nf=100 d6 flagship config (control: brick_caps0_chi128 = 2.26 s/circ).
brick_gate_ab() { # <tag> <extra envs...>
    local tag="$1"; shift
    [ -s "runs/perf_ab/$tag.json" ] && { log "skip $tag"; return 0; }
    log "brick gate A/B $tag"
    local envs=(QMLTPU_ROUTING=brick QMLTPU_CHI=128 QMLTPU_SIM_BATCH=10 "$@")
    timeout 7200 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
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

log "BACKLOG L COMPLETE"
