#!/bin/bash
# Arm the round-3 TPU queue: block on the relay watcher, then run the
# queue; if the queue aborts because the relay flapped (rc=3), re-arm.
# Run ONE instance only (one TPU process at a time — CLAUDE.md).
cd "$(dirname "$0")/.."
for attempt in 1 2 3 4 5; do
  echo "[auto] arming watcher (attempt $attempt)" >> runs/r3_queue_status.txt
  bash scripts/tpu_watch.sh
  bash scripts/round3_queue.sh
  rc=$?
  [ "$rc" -ne 3 ] && exit "$rc"
done
echo "[auto] gave up after 5 relay flaps" >> runs/r3_queue_status.txt
exit 3
