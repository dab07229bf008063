#!/bin/bash
# Sequential TPU work queue with wedge protection: ping (fast, safe to
# kill) gates every heavy job so a wedged tunnel never gets a heavy job
# killed mid-op (which re-wedges it ~15 min).
#
# The per-job `timeout` is a LAST RESORT against a hung job blocking
# the queue forever — if it fires, the SIGTERM lands mid-TPU-op and the
# tunnel will wedge ~15 min (the next job's ping gate then aborts the
# queue instead of compounding). Size timeouts >=3x the expected
# runtime so they only fire on genuine hangs; jobs themselves must be
# self-terminating (CLAUDE.md environment rules).
cd /root/repo
set -u
run() {
  local script="$1" tmo="$2"
  if ! timeout 90 python scripts/tpu_ping.py > /dev/null 2>&1; then
    echo "TUNNEL WEDGED before $script — aborting queue"
    exit 2
  fi
  echo "=== $script (timeout ${tmo}s) ==="
  timeout "$tmo" python -u "scripts/$script" > "scripts/${script%.py}.log" 2>&1
  echo "=== $script rc=$? ==="
  # heavy jobs leave the tunnel draining well past 20 s — a too-early
  # ping then reads as WEDGED and aborts the queue spuriously
  sleep 60
}
for job in "$@"; do
  IFS=: read -r s t <<< "$job"
  run "$s" "${t:-580}"
done
echo "QUEUE DONE"
