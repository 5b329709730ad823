#!/usr/bin/env bash
# Round-3 continuation on-chip backlog (the round-2 verdict's remaining
# items + the round-3 knob A/Bs). Sequential — one chip — and resumable:
# every stage skips work whose artifact already exists. Launch detached:
#   nohup bash scripts/backlog_r3c.sh > /tmp/backlog.log 2>&1 &
# Progress: tail /tmp/backlog.log; artifacts land under runs/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
LOG=/tmp/backlog_stages
mkdir -p "$LOG" runs/perf_ab

stage() { echo "== [$(date +%H:%M:%S)] $*"; }

[ -f datasets/elliptic_preproc.csv ] || python -m qml_cutensornet_tpu.cli.make_synthetic

# ---------- A. perf_ab: bench.py knob A/Bs (decide shipped defaults) ----
bench_ab() { # bench_ab <name> [ENV=val ...]
    local name="$1"; shift
    [ -s "runs/perf_ab/$name.json" ] && { echo "skip $name"; return 0; }
    stage "perf_ab $name ($*)"
    if timeout 3600 env "$@" python bench.py \
        > "$LOG/$name.out" 2> "$LOG/$name.err"; then
        tail -1 "$LOG/$name.out" > "runs/perf_ab/$name.json"
        grep -E "warm run|avg_fidelity|max_abs_err" "$LOG/$name.err" \
            > "runs/perf_ab/$name.err.txt" || true
        cat "runs/perf_ab/$name.json"
    else
        echo "FAILED $name:"; tail -3 "$LOG/$name.err"
    fi
}

bench_ab bench
bench_ab bench_fused QMLTPU_FUSED_SPLIT=1
bench_ab bench_plain2_chi128 QMLTPU_SUBSPACE_ITERS=2 BENCH_CHI=128
bench_ab bench_fused2_chi128 QMLTPU_FUSED_SPLIT=1 QMLTPU_SUBSPACE_ITERS=2 BENCH_CHI=128
bench_ab bench_tp QMLTPU_TILE_PRECISION=high
bench_ab bench_pp_chi128 QMLTPU_POWER_PRECISION=high BENCH_CHI=128
bench_ab bench_chi256 BENCH_CHI=256
bench_ab bench_fused_chi256 QMLTPU_FUSED_SPLIT=1 BENCH_CHI=256

# ---------- B. brick structural-caps A/B at nf=100 d6 -------------------
brick_ab() { # brick_ab <tag> <caps>
    local tag="$1" caps="$2"
    [ -s "runs/perf_ab/$tag.json" ] && { echo "skip $tag"; return 0; }
    stage "brick caps A/B $tag"
    local envs=(QMLTPU_ROUTING=brick QMLTPU_CHI=128 QMLTPU_SIM_BATCH=10
        QMLTPU_BRICK_CAPS=$caps)
    timeout 3600 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
        TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv \
        > "$LOG/$tag.prewarm.out" 2>&1 || { echo "FAILED $tag prewarm"; return 0; }
    rm -f train_Nf*.json kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null
    timeout 1800 env "${envs[@]}" python -m qml_cutensornet_tpu.cli.main_no_test \
        TPU 100 2 1.0 6 5 5 5 elliptic_preproc.csv \
        > "$LOG/$tag.out" 2>&1 || { echo "FAILED $tag record"; return 0; }
    for j in train_Nf*.json; do
        [ -f "$j" ] && mv "$j" "runs/perf_ab/$tag.json"
    done
    rm -f kernels/train_Nf*.npy train_Nf*.npy 2>/dev/null
    python - "$tag" <<'EOF'
import json, sys
rec = json.load(open(f"runs/perf_ab/{sys.argv[1]}.json"))
print(sys.argv[1], {k: rec.get(k) for k in ("avg_circ_sim", "median_circ_sim", "ave max chi x", "avg_fidelity")})
EOF
}
brick_ab brick_caps0_chi128 0
brick_ab brick_caps1_chi128 1

# ---------- C. runtime_scaling warm rows (verdict weak #2) ---------------
if ! grep -q "warm" runs/runtime_scaling/results.csv 2>/dev/null; then
    stage "runtime_scaling warm rows"
    timeout 3600 python runs/runtime_scaling/sweep_inproc.py \
        > "$LOG/runtime_warm.out" 2>&1 \
        && echo "runtime_scaling warm rows done" \
        || { echo "FAILED runtime_scaling"; tail -3 "$LOG/runtime_warm.out"; }
fi

# ---------- D. qubit_scaling: remaining nf points ------------------------
stage "qubit_scaling nf=90,120,150 (resumable driver skips existing)"
timeout 14400 env NFS="90 120 150" QMLTPU_SIM_BATCH=10 \
    python runs/qubit_scaling/sweep_inproc.py > "$LOG/qubit_scaling.out" 2>&1 \
    && echo "qubit_scaling done" \
    || { echo "FAILED qubit_scaling"; tail -3 "$LOG/qubit_scaling.out"; }
( cd runs/qubit_scaling && python to_csv.py && python plot.py ) \
    > /dev/null 2>&1 || true

# ---------- E. mem_evol d12 on chip --------------------------------------
stage "mem_evol d12 (chi cap 512, sim_batch 1)"
for x in 0 1 2 3 4 5 6 7; do
    out="runs/mem_evol/raw/d12/$x.out"
    # Re-record the two CPU-hedged points on chip for a consistent cap.
    if [ -s "$out" ] && grep -q "axon" "$out"; then echo "skip d12 x=$x"; continue; fi
    timeout 3600 env QMLTPU_CHI=512 QMLTPU_SIM_BATCH=1 \
        python -m qml_cutensornet_tpu.cli.main_track_mem \
        TPU 100 2 1.0 12 5 5 5 elliptic_preproc.csv "$x" \
        2> "$out.tmp" > /dev/null \
        && mv "$out.tmp" "$out" && echo "mem_evol d12 x=$x done" \
        || { echo "FAILED mem_evol x=$x"; tail -2 "$out.tmp" 2>/dev/null; }
done
( cd runs/mem_evol && python plot.py ) > /dev/null 2>&1 || true

# ---------- F. table2: remaining 4 seeds ---------------------------------
stage "table2 seeds 20 25 30 35 (resumable driver skips existing)"
timeout 28800 env SEEDS="20 25 30 35" QMLTPU_SIM_BATCH=50 \
    python runs/table2/sweep_inproc.py > "$LOG/table2.out" 2>&1 \
    && echo "table2 done" \
    || { echo "FAILED table2"; tail -3 "$LOG/table2.out"; }
( cd runs/table2 && python to_csv.py ) > /dev/null 2>&1 || true

# ---------- G. crossover CPU-criterion d10 -------------------------------
if ! grep -q "^100,linear,2,1.0,10," runs/crossover/cpu_results.csv 2>/dev/null; then
    stage "crossover CPU-criterion d10"
    timeout 7200 env DS=10 QMLTPU_CHI=512 QMLTPU_SIM_BATCH=5 QMLTPU_TILE=10 \
        bash runs/crossover/run_all.sh > "$LOG/crossover_cpu_d10.out" 2>&1 \
        && echo "crossover cpu d10 done" \
        || { echo "FAILED crossover cpu d10"; tail -3 "$LOG/crossover_cpu_d10.out"; }
fi

stage "BACKLOG COMPLETE"
