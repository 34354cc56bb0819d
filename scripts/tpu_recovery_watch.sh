#!/bin/bash
# Training-degradation recovery watcher (see CLAUDE.md "Environment
# degradation mode"). The axon relay intermittently fails every
# training-size program (>= ~11GB) at runtime with a detail-less
# RESOURCE_EXHAUSTED while inference-size programs run fine. This
# watcher polls with the cheapest training canary (tuning batch 4,
# executable persistently cached -> ~1 min/try when healthy) and, on
# the first pass, runs the full five-config training measurement
# matrix that BASELINE.md still needs (reference configs:
# /root/reference/README.md:34-54,62-74).
#
# Usage:  nohup bash scripts/tpu_recovery_watch.sh > /tmp/recovery.log 2>&1 &
#         echo $! > /tmp/recovery.pid        # kill $(cat /tmp/recovery.pid)
# Lives in the repo because /tmp is wiped between rounds.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
POLL_S="${E4T_WATCH_POLL_S:-1200}"
TRY_TIMEOUT="${E4T_WATCH_TRY_TIMEOUT:-2400}"
# Matrix configs may pay a cold 15-25 min compile each when the
# persistent cache was invalidated (source changes / wiped cache dir),
# so they get a larger budget than the canary poll.
MATRIX_TIMEOUT="${E4T_WATCH_MATRIX_TIMEOUT:-5400}"

try_canary() {
    E4T_TUNE_BATCH=4 timeout "$TRY_TIMEOUT" python scripts/bench_tuning.py 2>&1
}

while true; do
    echo "--- $(date -u +%FT%TZ) canary try ---"
    out=$(try_canary); rc=$?
    echo "$out" | tail -6
    # no pipe here: under pipefail, `echo | grep -q` can return 141
    # (grep exits at first match -> echo gets EPIPE) and fail a
    # genuinely passed canary (round-5 review finding)
    if [ $rc -eq 0 ] && [[ "$out" == *'"metric"'* ]]; then
        echo "### CANARY PASSED $(date -u +%FT%TZ) — running full matrix ###"
        for cfg in \
            "bench_tuning.py E4T_TUNE_BATCH=16 E4T_TUNE_MICRO=4" \
            "bench_tuning.py E4T_TUNE_BATCH=2" \
            "bench_pretrain.py E4T_PRE_BATCH=8 E4T_PRE_MICRO=4" \
            "bench_pretrain.py E4T_PRE_BATCH=16 E4T_PRE_MICRO=8" \
            "bench_pretrain.py E4T_PRE_BATCH=2"; do
            set -- $cfg; script=$1; shift
            echo "=== $(date -u +%FT%TZ) $script $* ==="
            env "$@" timeout "$MATRIX_TIMEOUT" python "scripts/$script" 2>&1 | tail -20
            echo "=== rc=${PIPESTATUS[0]} ==="
        done
        echo "### MATRIX DONE $(date -u +%FT%TZ) — fold into CLAUDE.md Measured ###"
        exit 0
    fi
    echo "--- canary failed (rc=$rc), sleeping ${POLL_S}s ---"
    sleep "$POLL_S"
done
