#!/usr/bin/env bash
# Round-5 on-chip chain, stage B — experiment suites on the v2 dataset
# (run ONLY after the dataset provenance bump + golden regen commit):
#   1. table3 depth grid r in {2,4,8,12,16,20} x 6 seeds (verdict #3).
#   2. table2 quantum grid d x gamma x 6 seeds + classical baseline
#      (verdict #4).
#   3. qml_figures nf sweep at ntr=150.
#   4. CSV/figure regeneration.
# In-process sweeps (one python per suite) keep the AOT program loads
# amortized. Idempotent per raw file; single-instance via /tmp/backlog_r5.pid.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r5b.log
SD=/tmp/backlog_stages_r5b
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_r5.pid ] && kill -0 "$(cat /tmp/backlog_r5.pid)" 2>/dev/null; then
    log "another r5 chain is running (pid $(cat /tmp/backlog_r5.pid)); exiting"
    exit 1
fi
echo $$ > /tmp/backlog_r5.pid
log "starting r5 stage B (v2 dataset suites)"

python scripts/tpu_smoke.py --ensure >> "$LOG" 2>&1 || log "smoke FAILED"

log "table3 sweep (in-process)"
timeout 21600 python runs/table3/sweep_inproc.py > "$SD/table3.out" 2>&1 \
    && log "table3 sweep OK" || { log "table3 sweep rc=$?"; tail -6 "$SD/table3.out" >> "$LOG"; }
(cd runs/table3 && python to_csv.py) >> "$LOG" 2>&1 && log "table3 csv regenerated"

log "table2 sweep (in-process)"
timeout 21600 python runs/table2/sweep_inproc.py > "$SD/table2.out" 2>&1 \
    && log "table2 sweep OK" || { log "table2 sweep rc=$?"; tail -6 "$SD/table2.out" >> "$LOG"; }
(cd runs/table2 && python to_csv.py) >> "$LOG" 2>&1 && log "table2 csv regenerated"

log "qml_figures sweep"
for nf in 15 50 100 165; do
    tag="Nf${nf}_r2_g0.1_p0.0_nn1_mslinear_Ntr150_s5_elliptic_preproc"
    [ -f "runs/qml_figures/raw/train_${tag}.npy" ] && continue
    log "qml_figures nf=$nf"
    if timeout 7200 python -m qml_cutensornet_tpu.cli.main TPU "$nf" 2 0.1 1 150 150 5 \
        elliptic_preproc.csv > "$SD/qmlfig_nf${nf}.out" 2>&1; then
        mv "data/train_${tag}.npy" "data/test_${tag}.npy" runs/qml_figures/raw/ 2>/dev/null \
            || log "qml_figures nf=$nf: data files missing"
        rm -f train_${tag}.json test_${tag}.json kernels/*_${tag}.npy 2>/dev/null
        log "qml_figures nf=$nf OK"
    else
        log "FAILED qml_figures nf=$nf rc=$?"; tail -4 "$SD/qmlfig_nf${nf}.out" >> "$LOG"
    fi
done
(cd runs/qml_figures && python plot.py) >> "$LOG" 2>&1 && log "qml_figures plot OK"
(cd runs/table3 && python plot.py) >> "$LOG" 2>&1 || true
(cd runs/table2 && python plot.py) >> "$LOG" 2>&1 || true

rm -f /tmp/backlog_r5.pid
log "R5 STAGE B COMPLETE"
