#!/usr/bin/env bash
# Round-3 follow-up on-chip A/Bs (after scripts/backlog_r3c.sh):
# - chi128 defaults row (baseline for the chi128 knob rows)
# - iters=2 re-measure after the double-multiply fix (ops/svd.py 0e3e8ff)
# - subspace oversampling fidelity-vs-time (QMLTPU_OVERSAMPLE)
# - brick routing at the 32q bench config (dispatch-bound regime)
# Resumable: every stage skips work whose artifact already exists.
#   nohup bash scripts/backlog_r3d.sh > /tmp/backlog_d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
LOG=/tmp/backlog_stages
mkdir -p "$LOG" runs/perf_ab

stage() { echo "== [$(date +%H:%M:%S)] $*"; }

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

# chi256 re-measure after the slice-before-residency fix (models/gram.py):
# the first records carried ~900 s of tunneled host round-trip because the
# residency decision saw the padded (not bucketed) state size.
for stale in bench_chi256 bench_fused_chi256; do
    if [ -s "runs/perf_ab/$stale.json" ] \
        && [ ! -e "runs/perf_ab/${stale}_prefix_v1.json" ]; then
        mv "runs/perf_ab/$stale.json" "runs/perf_ab/${stale}_prefix_v1.json"
        mv "runs/perf_ab/$stale.err.txt" "runs/perf_ab/${stale}_prefix_v1.err.txt" 2>/dev/null || true
    fi
done
bench_ab bench_chi256 BENCH_CHI=256
bench_ab bench_fused_chi256 QMLTPU_FUSED_SPLIT=1 BENCH_CHI=256

bench_ab bench_chi128 BENCH_CHI=128
bench_ab bench_fused_chi128 QMLTPU_FUSED_SPLIT=1 BENCH_CHI=128
bench_ab bench_dm2_chi128 QMLTPU_SUBSPACE_ITERS=2 BENCH_CHI=128
bench_ab bench_over16 QMLTPU_OVERSAMPLE=16
bench_ab bench_over16_chi128 QMLTPU_OVERSAMPLE=16 BENCH_CHI=128
bench_ab bench_brick_chi128 QMLTPU_ROUTING=brick BENCH_CHI=128
bench_ab bench_brick_chi192 QMLTPU_ROUTING=brick BENCH_CHI=192
bench_ab bench_fused_over16 QMLTPU_FUSED_SPLIT=1 QMLTPU_OVERSAMPLE=16
# Large-chi precision knobs: compute-bound regime where 3-pass bf16 can
# actually buy ~2x (at chi64 the phases are latency-bound and it bought 0).
bench_ab bench_tp_chi256 QMLTPU_TILE_PRECISION=high BENCH_CHI=256
bench_ab bench_pp_chi256 QMLTPU_POWER_PRECISION=high BENCH_CHI=256

stage "FOLLOWUP COMPLETE"
