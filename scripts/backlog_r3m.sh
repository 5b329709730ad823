#!/usr/bin/env bash
# Round-3 on-chip backlog, batch m (waits for batch j): COMPOSED-lever
# A/Bs. Batches l/k/j measure the three serial-column-latency levers
# (QMLTPU_FUSED_GATE, QMLTPU_MGS_PAIR, QMLTPU_*_BLOCK_BYTES=25e6) one at
# a time; the DESIGN.md latency-wall model predicts the levers are
# MULTIPLICATIVE (grid-block count x chain length x launch count), so the
# composition is where the predicted 0.0828 -> ~0.01 s/op at chi128 lives.
# Cold(7200)/warm(1800) pairs: every composition is a fresh kernel-body
# set for the AOT tunnel (~367 s per fresh shape), banked into the
# persistent compile cache by the cold pass.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_m.log
SD=/tmp/backlog_stages_m
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_j.pid ]; then
    log "waiting for batch j (pid $(cat /tmp/backlog_j.pid))"
    tail --pid="$(cat /tmp/backlog_j.pid)" -f /dev/null 2>/dev/null
fi
log "batch j done; starting batch m"

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

# REVISED after batch i's data (round 4): the fused-gate kernel LOSES
# standalone at chi64 (4.16 vs 2.59 s ctrl) and chi128 (7.94 vs 7.40), so
# the gate+pair compositions are dropped. Kept: the pair+budget
# composition at chi64 (batch k only covers chi128/256), and the full
# triple at chi128 — the gate kernel's plausible failure mode is
# grid-block replay of its longer body, which the 25e6 budgets attack, so
# one composed stage settles whether gate+blocks flips the verdict
# (batch j's bench_gate_blk25_chi128 is the other half of that answer).
bench_stage bench_pairblk25_chi64_cold 7200 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pairblk25_chi64      1800 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

# all three levers at chi128 (the latency-wall model's headline case)
bench_stage bench_triple_chi128_cold 7200 QMLTPU_FUSED_GATE=1 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6 BENCH_CHI=128
bench_stage bench_triple_chi128      1800 QMLTPU_FUSED_GATE=1 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6 BENCH_CHI=128

# flagship nf=100 d6 brick config under pair (NO gate — it lost):
brick_ab() { # <tag> <extra envs...>
    local tag="$1"; shift
    [ -s "runs/perf_ab/$tag.json" ] && { log "skip $tag"; return 0; }
    log "brick A/B $tag"
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
brick_ab brick_pair_chi128 QMLTPU_MGS_PAIR=1

log "BACKLOG M COMPLETE"
