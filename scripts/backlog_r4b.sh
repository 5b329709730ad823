#!/usr/bin/env bash
# Round-4 on-chip backlog, batch b (waits for batch r4a): smoke-gate
# validation + the chi>=256 regime (round-3 verdict item 3).
#   1. tpu_smoke --ensure (writes the stamp for the current kernels) and
#      --selftest (negative control: a deliberate [B,1,1] kernel must DIE
#      on real lowering — proves the gate catches the class).
#   2. chi256 A/B ladder: control, +pair, +blk25 budgets, +both — the
#      serial-column latency wall levers in the regime where the blocked
#      (k>128) path runs. Cold(7200)/warm(1800) pairs; the cold pass banks
#      fresh Mosaic shapes into the persistent cache.
#   3. crossover d10 at chi cap 512, brick engine, avg-chi >= 500 target
#      (reference regime: gpu_results.csv chi 595.6 / 237.3 s at d12).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r4b.log
SD=/tmp/backlog_stages_r4b
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_r4a.pid ]; then
    log "waiting for batch r4a (pid $(cat /tmp/backlog_r4a.pid))"
    tail --pid="$(cat /tmp/backlog_r4a.pid)" -f /dev/null 2>/dev/null
fi
log "starting batch r4b"

# --- 1. smoke stamp + negative selftest --------------------------------
timeout 3600 python scripts/tpu_smoke.py --ensure > "$SD/smoke.out" 2>&1 \
    && log "smoke --ensure OK" || log "smoke --ensure FAILED rc=$?"
if [ ! -f "$SD/selftest.done" ]; then
    timeout 3600 python scripts/tpu_smoke.py --selftest > "$SD/selftest.out" 2>&1 \
        && { log "smoke --selftest PASS (abort class caught)"; touch "$SD/selftest.done"; } \
        || { log "smoke --selftest FAILED rc=$?"; tail -4 "$SD/selftest.out" >> "$LOG"; }
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

# --- 2. chi256 lever ladder (control = bench_chi256: 32.2 s) -----------
bench_stage bench_ctrl_chi256_r4   1800 BENCH_CHI=256
bench_stage bench_blk25_chi256_cold 7200 BENCH_CHI=256 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_blk25_chi256     1800 BENCH_CHI=256 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pairblk25_chi256_cold 7200 BENCH_CHI=256 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6
bench_stage bench_pairblk25_chi256 1800 BENCH_CHI=256 QMLTPU_MGS_PAIR=1 \
    QMLTPU_FUSED_BLOCK_BYTES=25e6 QMLTPU_QR_BLOCK_BYTES=25e6

# --- 2b. chunk-length A/B at the headline config: the 32q stream is 1092
# ops = 9+ host dispatches through the tunnel at the 128 default; 384/1152
# cut that to 3/1. Numerics-neutral modulo staged-chi granularity
# (tests/test_chunk_len.py; f64 exact to 8e-15).
bench_stage bench_chunk384_cold  7200 QMLTPU_CHUNK_LEN=384
bench_stage bench_chunk384       1800 QMLTPU_CHUNK_LEN=384
bench_stage bench_chunk1152_cold 7200 QMLTPU_CHUNK_LEN=1152
bench_stage bench_chunk1152      1800 QMLTPU_CHUNK_LEN=1152

# --- 3. crossover deep-chi regime: tracked chi1024 at d12, sim_batch 1 --
# The chi512 d12 row exists (avg chi 295 — the cap cut 0.45% fidelity, so
# it WAS binding); the cap-1024 run is the one that can show avg chi >= 500
# like the reference's 595.6 (gpu_results.csv d12). sim_batch 1: chi1024 at
# sim_batch 2 OOMs HBM (scan-carry double buffer, round-3 roadmap).
crossover_run() { # <tag> <d> <chi> <sim_batch> <extra envs...>
    local tag="$1" d="$2" chi="$3" sb="$4"; shift 4
    local name="train_Nf100_r2_g1.0_p0.0_nn${d}_mslinear_Ntr5_s5_elliptic_preproc"
    [ -s "runs/crossover/raw/gpu/${name}_${tag}.json" ] && { log "skip $tag"; return 0; }
    log "crossover $tag (d=$d chi=$chi sim_batch=$sb)"
    local envs=(QMLTPU_CHI=$chi QMLTPU_SIM_BATCH=$sb "$@")
    if timeout 14400 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
        TPU 100 2 1.0 "$d" 5 5 5 elliptic_preproc.csv \
        > "$SD/$tag.out" 2>&1; then
        mv "${name}.json" "runs/crossover/raw/gpu/${name}_${tag}.json" 2>/dev/null \
            || log "crossover $tag: profiling JSON missing"
        rm -f kernels/train_Nf100_*.npy train_Nf100_*.npy 2>/dev/null
        log "crossover $tag OK"
    else
        log "FAILED $tag rc=$?"; tail -4 "$SD/$tag.out" >> "$LOG"
    fi
}
crossover_run tracked_chi1024_d12 12 1024 1
(cd runs/crossover && python to_csv.py) >> "$LOG" 2>&1 && log "crossover csv regenerated"

log "BACKLOG R4B COMPLETE"
