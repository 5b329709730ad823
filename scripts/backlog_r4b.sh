#!/usr/bin/env bash
# Round-4 on-chip backlog, batch b — extras after the main chain + r4a:
#   1. crossover tracked chi1024 at d12, sim_batch 1 (the avg-chi >= 500
#      reference regime; chi512 d12 banked avg 295 with the cap binding).
#   2. tile-contraction micro-profile (verdict item 8).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r4b.log
SD=/tmp/backlog_stages_r4b
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }
log "starting batch r4b"

# --- 1. crossover deep-chi regime: tracked chi1024 at d12, sim_batch 1 --
# chi1024 at sim_batch 2 OOMs HBM (scan-carry double buffer, round-3
# roadmap); the cap-1024 run is the one that can show avg chi >= 500 like
# the reference's 595.6 (gpu_results.csv d12).
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

# --- 2. tile micro-profile ----------------------------------------------
timeout 7200 python scripts/profile_tile.py > "$SD/profile_tile.out" 2>&1 \
    && { log "profile_tile OK"; tail -14 "$SD/profile_tile.out" >> "$LOG"; } \
    || log "FAILED profile_tile rc=$?"

log "BACKLOG R4B COMPLETE"
