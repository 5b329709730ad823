#!/usr/bin/env bash
# Round-3 on-chip backlog, batch f (waits for batch e to exit):
#   1. crossover CPU-criterion d10 rerun — batch e's attempt OOMed the
#      tile phase; the memory-aware tile clamp (models/gram._auto_tile)
#      is the fix under test.
#   2. mem_evol d12 x=0 rerun so all 8 traces share one config (batch e's
#      x=1..7 run under the new oversample>=128 default; the old 0.out
#      predates it).
#   3. scripts/profile_op.py at chi 256 / 512 — per-phase decomposition of
#      the large-chi two-site update for the peak-fraction push.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_f.log
SD=/tmp/backlog_stages_f
mkdir -p "$SD"

log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_e.pid ]; then
    log "waiting for batch e (pid $(cat /tmp/backlog_e.pid))"
    tail --pid="$(cat /tmp/backlog_e.pid)" -f /dev/null 2>/dev/null
fi
log "batch e done; starting batch f"

# --- 1. crossover CPU d10, take 2 -------------------------------------
for pass in warm run; do
    log "crossover CPU d10 $pass"
    if timeout 3600 env QMLTPU_CHI=512 QMLTPU_SIM_BATCH=10 \
        python -m qml_cutensornet_tpu.cli.main_no_test CPU 100 2 1.0 10 5 5 5 \
        elliptic_preproc.csv > "$SD/xover_cpu_d10_$pass.out" 2> "$SD/xover_cpu_d10_$pass.err"; then
        if [ "$pass" = run ]; then
            mv -f train_Nf*.json runs/crossover/raw/cpu/ 2>/dev/null
            log "crossover CPU d10 OK"
        fi
    else
        log "FAILED xover_cpu_d10_$pass rc=$?"
        tail -4 "$SD/xover_cpu_d10_$pass.err" >> "$LOG"
    fi
    rm -f train_Nf*.npy train_Nf*.json kernels/train_Nf*.npy 2>/dev/null
done

# --- 2. mem_evol d12 x=0 rerun ----------------------------------------
log "mem_evol d12 x=0 (chi 1024, current defaults)"
if timeout 5400 env QMLTPU_CHI=1024 \
    python -m qml_cutensornet_tpu.cli.main_track_mem TPU 100 2 1.0 12 5 5 5 \
    elliptic_preproc.csv 0 > "$SD/memevol_d12_0.out" 2> /tmp/memevol_d12_0.err; then
    mv -f /tmp/memevol_d12_0.err runs/mem_evol/raw/d12/0.out
    log "mem_evol d12 x=0 OK ($(grep -c 'MPS size' runs/mem_evol/raw/d12/0.out) lines)"
else
    log "FAILED memevol_d12_0 rc=$?"; tail -4 /tmp/memevol_d12_0.err >> "$LOG"
fi

# --- 3. per-phase op profile ------------------------------------------
for chi in 256 512; do
    log "profile_op chi=$chi"
    if timeout 2400 python scripts/profile_op.py "$chi" 10 8 \
        > "$SD/profile_chi$chi.out" 2> "$SD/profile_chi$chi.err"; then
        cat "$SD/profile_chi$chi.out" >> "$LOG"
    else
        log "FAILED profile_chi$chi rc=$?"; tail -4 "$SD/profile_chi$chi.err" >> "$LOG"
    fi
done

log "BACKLOG F COMPLETE"
