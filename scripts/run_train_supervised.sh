#!/bin/bash
# Supervised training launcher: relaunch into the crash-safe resume path when
# the run dies from a stall (utils/stall.py exit 43: lost TPU-tunnel RPC),
# the RSS-watchdog execv (handled in-process), OOM-kill (137), or any other
# abnormal exit. Bounded retries so a config error cannot loop forever.
#
# Usage: scripts/run_train_supervised.sh CONFIG [extra dfdp_net args...]
# e.g.:  nohup scripts/run_train_supervised.sh \
#          configs/dfdp_synthetic_train_512_v4_warmstart.yml \
#          > logs/train_512_v4ws.log 2>&1 & echo $! > /tmp/train_v4ws.pid
set -u
cd "$(dirname "$0")/.."

CONFIG=$1; shift
MAX_RETRIES=${MAX_RETRIES:-8}

for attempt in $(seq 0 "$MAX_RETRIES"); do
  [ "$attempt" -gt 0 ] && echo "=== supervised relaunch #$attempt ($(date -u +%FT%TZ)) ==="
  python apps/dfdp_net.py --config "$CONFIG" --stage train "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== training completed cleanly ==="
    exit 0
  fi
  echo "=== trainer exited rc=$rc ($(date -u +%FT%TZ)); resuming from last epoch state ==="
  sleep 15   # let the tunnel/TPU admission settle
done
echo "=== giving up after $MAX_RETRIES relaunches ==="
exit 1
