#!/bin/bash
# TPU-wedge recovery watcher (CLAUDE.md wedge protocol).
# Probes backend init every ~4 min; on first success, runs the queued TPU
# job (cache-priming default bench) exactly once, then exits.
# Status file: /tmp/tpu_watch.status  (PROBING / RECOVERED / BENCH_RUNNING / DONE)
set -u
STATUS=/tmp/tpu_watch.status
LOG=/tmp/tpu_watch.log
BENCHLOG=/tmp/bench_prime.log
cd /root/repo
echo PROBING > "$STATUS"
while true; do
  if timeout 150 python -c "import jax; jax.devices()" >> "$LOG" 2>&1; then
    echo RECOVERED > "$STATUS"
    break
  fi
  echo "$(date +%s) probe failed" >> "$LOG"
  sleep 240
done
echo BENCH_RUNNING > "$STATUS"
timeout 3600 python bench.py > "$BENCHLOG" 2>&1
echo "DONE rc=$?" > "$STATUS"
