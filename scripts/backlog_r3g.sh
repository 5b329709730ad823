#!/usr/bin/env bash
# Round-3 on-chip backlog, batch g (waits for batch f): per-phase op
# profile at the PRODUCTION chi (64, 128) — the dispatch/latency-bound
# regime where the serial per-column orthonormalizer scans are suspected
# to dominate (512 sequential column steps per op at chi64, see
# docs/ROADMAP.md round-3 notes). B=100 matches the bench batch.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/backlog_g.log
SD=/tmp/backlog_stages_g
mkdir -p "$SD"
log() { echo "== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

if [ -f /tmp/backlog_f.pid ]; then
    log "waiting for batch f (pid $(cat /tmp/backlog_f.pid))"
    tail --pid="$(cat /tmp/backlog_f.pid)" -f /dev/null 2>/dev/null
fi
log "batch f done; starting batch g"

for chi in 64 128; do
    log "profile_op chi=$chi B=100"
    if timeout 2400 python scripts/profile_op.py "$chi" 100 16 \
        > "$SD/profile_chi$chi.out" 2> "$SD/profile_chi$chi.err"; then
        cat "$SD/profile_chi$chi.out" >> "$LOG"
    else
        log "FAILED profile_chi$chi rc=$?"; tail -4 "$SD/profile_chi$chi.err" >> "$LOG"
    fi
done
log "BACKLOG G COMPLETE"
