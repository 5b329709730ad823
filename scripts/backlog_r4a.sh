#!/usr/bin/env bash
# Round-4 on-chip backlog, batch a (waits for batch m): experiment-scale
# data completeness — the round-3 verdict's items 4 and 5.
#   1. Real runtime_scaling rows at the reference configs: nf=165 r2 d1
#      g0.1, 400/800/1600 points (ntr 200/400/800) on the one chip, warm,
#      via the in-process sweep. ntr=800 needs 800 illicit rows, so these
#      rows use an 8000-labeled synthetic in its own dataset dir (the
#      canonical golden-pinned 2000-row set has only 500 illicit).
#   2. qubit_scaling nf=165 g0.1 outlier rerun (verdict weak #3: 27.3 s
#      avg_mps_time at chi 2.75 against a 1.5-3.3 s trend — compile/
#      transfer contamination), then CSV + figure regen.
#   3. table3 depth-grid completion: r in {2,4,8,12,16,20} x 6 seeds,
#      skipping combos already banked in runs/table3/raw/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_r4a.log
SD=/tmp/backlog_stages_r4a
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_m.pid ]; then
    log "waiting for batch m (pid $(cat /tmp/backlog_m.pid))"
    tail --pid="$(cat /tmp/backlog_m.pid)" -f /dev/null 2>/dev/null
fi
log "batch m done; starting batch r4a"

# --- 0. site-blocked tile scan A/B (QMLTPU_TILE_BLOCK, added mid-round) --
# The tile phase is latency/bandwidth bound (~0.64 s of the 2.59 s chi64
# wall); k=2 halves the scan's carry round-trips at identical FLOPs.
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
bench_stage bench_tileblk2        3600 QMLTPU_TILE_BLOCK=2
bench_stage bench_tileblk4        3600 QMLTPU_TILE_BLOCK=4
bench_stage bench_tileblk2_chi128 3600 QMLTPU_TILE_BLOCK=2 BENCH_CHI=128

# --- 1. runtime_scaling at reference configs --------------------------
if [ ! -f runs/runtime_scaling/raw/train_Nf165_r2_g0.1_p0.0_nn1_mslinear_Ntr800_s5_elliptic_preproc_8k_m1.json ]; then
    log "runtime_scaling: building 8k synthetic + warm sweep ntr 200/400/800"
    python - >> "$LOG" 2>&1 <<'PYEOF'
from qml_cutensornet_tpu.utils.data import make_synthetic_elliptic, preprocess_elliptic
make_synthetic_elliptic(dataset_dir="datasets/elliptic_synth8k", n_labeled=8000, seed=1)
df = preprocess_elliptic(dataset_dir="datasets/elliptic_synth8k",
                         out_csv="datasets/elliptic_preproc_8k.csv")
print("elliptic_preproc_8k.csv:", len(df), "rows,",
      int((df['Class'] == 0).sum()), "illicit")
PYEOF
    if timeout 7200 env DF=elliptic_preproc_8k.csv NTRS="200 400 800" \
        python runs/runtime_scaling/sweep_inproc.py \
        > "$SD/runtime_scaling.out" 2> "$SD/runtime_scaling.err"; then
        (cd runs/runtime_scaling && python plot.py) >> "$LOG" 2>&1
        log "runtime_scaling OK"; tail -8 "$SD/runtime_scaling.out" >> "$LOG"
    else
        log "FAILED runtime_scaling rc=$?"; tail -6 "$SD/runtime_scaling.err" >> "$LOG"
    fi
else
    log "skip runtime_scaling (banked)"
fi

# --- 2. qubit_scaling nf=165 g0.1 outlier rerun (warm) ----------------
QS_RAW=runs/qubit_scaling/raw/train_Nf165_r2_g0.1_p0.0_nn6_mslinear_Ntr5_s5_elliptic_preproc.json
if [ ! -f "$QS_RAW.redone" ]; then
    log "qubit_scaling nf=165 g0.1 rerun"
    # Prewarm the nf=165 shapes (g1.0 shares the programs), then record.
    timeout 5400 python -m qml_cutensornet_tpu.cli.main_no_test TPU 165 2 1.0 6 5 5 5 \
        elliptic_preproc.csv > "$SD/qs_prewarm.out" 2>&1 \
        || log "qs prewarm FAILED rc=$? (recording anyway)"
    rm -f train_Nf165_*.json kernels/train_Nf165_*.npy train_Nf165_*.npy 2>/dev/null
    if timeout 1800 python -m qml_cutensornet_tpu.cli.main_no_test TPU 165 2 0.1 6 5 5 5 \
        elliptic_preproc.csv > "$SD/qs_record.out" 2>&1; then
        mv train_Nf165_r2_g0.1_*.json "$QS_RAW"
        touch "$QS_RAW.redone"
        rm -f kernels/train_Nf165_*.npy train_Nf165_*.npy 2>/dev/null
        (cd runs/qubit_scaling && python to_csv.py && python plot.py) >> "$LOG" 2>&1
        log "qubit_scaling outlier rerun OK"
    else
        log "FAILED qubit_scaling rerun rc=$?"; tail -4 "$SD/qs_record.out" >> "$LOG"
    fi
else
    log "skip qubit_scaling rerun (banked)"
fi

# --- 3. table3 grid completion ----------------------------------------
# Reference grid: r in {2,4,8,12,16,20} x seeds {5,8,20,25,30,35}
# (/root/reference/runs/table3/results.csv). Prewarm once per NEW r (the
# compiled programs depend on the schedule = r, not the seed).
for r in 2 4 8 12 16 20; do
    for s in 5 8 20 25 30 35; do
        tag="Nf50_r${r}_g1.0_p0.0_nn1_mslinear_Ntr200_s${s}_elliptic_preproc"
        [ -f "runs/table3/raw/train_${tag}.npy" ] && continue
        log "table3 r=$r s=$s"
        if timeout 7200 python -m qml_cutensornet_tpu.cli.main TPU 50 "$r" 1.0 1 200 200 "$s" \
            elliptic_preproc.csv > "$SD/table3_r${r}_s${s}.out" 2>&1; then
            mv "data/train_${tag}.npy" "data/test_${tag}.npy" runs/table3/raw/ 2>/dev/null \
                || log "table3 r=$r s=$s: data files missing after run"
            rm -f train_${tag}.json test_${tag}.json kernels/*_${tag}.npy 2>/dev/null
            log "table3 r=$r s=$s OK"
        else
            log "FAILED table3 r=$r s=$s rc=$?"; tail -4 "$SD/table3_r${r}_s${s}.out" >> "$LOG"
        fi
    done
done
(cd runs/table3 && python to_csv.py) >> "$LOG" 2>&1 && log "table3 csv regenerated"

log "BACKLOG R4A COMPLETE"
