#!/bin/bash
# Second-stage TPU queue: waits for tpu_recover_watch.sh to finish its
# cache-priming bench run (status DONE), then runs the QAT quality study.
# Only one TPU process at a time (CLAUDE.md wedge protocol).
set -u
STATUS=/tmp/tpu_watch.status
LOG=/tmp/quality_qat.log
cd /root/repo
while true; do
  s=$(cat "$STATUS" 2>/dev/null || echo MISSING)
  case "$s" in
    DONE*) break ;;
  esac
  sleep 120
done
echo QAT_RUNNING > /tmp/tpu_queue.status
timeout 7200 python scripts/quality_qat.py > "$LOG" 2>&1
echo "QAT_DONE rc=$?" > /tmp/tpu_queue.status
