#!/bin/bash
# Tunnel-recovery watcher: probe the axon TPU tunnel on a loop; the moment
# it answers, wait for any running test suite (pidfile handshake — this
# host has ONE core, CLAUDE.md says serialize), then fire the queued TPU
# work (tools/run_tpu_queue.sh). Bounded; safe to re-run.
#
# Usage: bash tools/tpu_watch.sh [max_hours]   (from the repo root)
set -u
cd "$(dirname "$0")/.."
MAX_HOURS=${1:-10}
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
mkdir -p tpu_queue_logs

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform=='tpu'" \
      >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP"
    # serialize with a running test suite / heavy CPU job (pidfile handshake)
    if [ -f /tmp/suite.pid ]; then
      SP=$(cat /tmp/suite.pid)
      echo "waiting for suite pid $SP to finish"
      for _ in $(seq 720); do  # up to 2 h
        kill -0 "$SP" 2>/dev/null || break
        sleep 10
      done
    fi
    bash tools/run_tpu_queue.sh
    exit $?
  fi
  echo "$(date -u +%FT%TZ) tunnel still down; sleeping 480s"
  sleep 480
done
echo "watch window expired with tunnel down"
exit 2
