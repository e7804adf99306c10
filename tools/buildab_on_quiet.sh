#!/bin/bash
# Opportunistic dl-carry build A/B: probe the hardware ceiling every
# ~3 min; when a probe reads >= 0.85 (quiet co-tenant window) and the
# builder session isn't running its own heavy work (lock sentinel),
# run tools/build_bench.py once and stop.  Same protocol as
# draw_on_quiet.sh (scaling draws) — the build A/B needs a quiet
# window for the same reason: this box's co-tenant noise band is
# ±20%-3x and a 2-rep A/B can't alternate it away.
#
# Usage: bash tools/buildab_on_quiet.sh [logfile] [reps] [replicate]
set -u
LOG="${1:-/root/repo/BENCH/build_ab_r4.log}"
REPS="${2:-2}"
REPL="${3:-60}"
WATCH="/root/repo/BENCH/ceiling_watch_r4.log"
while true; do
  ts=$(date +%H:%M:%S)
  probe=$(python /root/repo/tools/hw_ceiling.py 4 2>/dev/null)
  echo "=== $ts (build-ab watcher)" >> "$WATCH"; echo "$probe" >> "$WATCH"
  ceil=$(echo "$probe" | python -c "import sys,json;print(json.load(sys.stdin)['hardware_ceiling'])" 2>/dev/null || echo 0)
  ok=$(python -c "print(1 if float('$ceil' or 0) >= 0.85 else 0)")
  if [ -e /tmp/bids_heavy.lock ]; then
    echo "=== $ts heavy-work lock present, not triggering" >> "$WATCH"
    ok=0
  fi
  if [ "$ok" = "1" ]; then
    {
      echo "=== BEFORE probe $(date +%H:%M:%S)"
      echo "$probe"
      echo "=== build A/B start $(date +%H:%M:%S)"
    } >> "$LOG"
    python /root/repo/tools/build_bench.py "$REPS" "$REPL" >> "$LOG" 2>&1
    rc=$?
    echo "=== build A/B end $(date +%H:%M:%S) exit=$rc" >> "$LOG"
    echo "=== AFTER probe $(date +%H:%M:%S)" >> "$LOG"
    python /root/repo/tools/hw_ceiling.py 4 >> "$LOG" 2>&1
    exit $rc
  fi
  sleep 150
done
