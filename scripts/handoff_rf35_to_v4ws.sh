#!/bin/bash
# TPU handoff: wait for the rf35mm v3 training run (pid in /tmp/train35.pid)
# to finish its 64-epoch schedule, then (1) run the rf35mm real-set sample
# eval with the freshly shipped checkpoint, (2) launch the queued v4
# warm-start fine-tune of the rf50mm checkpoint. One process holds the TPU
# at a time (single-chip rig; see BACKLOG.md "IN PROGRESS").
set -u
cd /root/repo

[ -s /tmp/train35.pid ] || { echo "no/empty /tmp/train35.pid — refusing to race the TPU"; exit 1; }
PID=$(cat /tmp/train35.pid)
ps -p "$PID" -o cmd= | grep -q "dfdp_net.py" \
  || { echo "pid $PID is not a dfdp_net.py process — stale pid file?"; exit 1; }
echo "waiting for rf35mm training (pid $PID) to exit..."
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "rf35mm training exited at $(date -u +%FT%TZ)"
sleep 10  # let orbax finish any in-flight async save

echo "=== rf35mm --stage sample ==="
timeout 1800 python apps/dfdp_net.py \
  --config configs/dfdp_by_sdirt_rf35mm.yml --stage sample \
  > logs/sample_rf35mm_v3.log 2>&1
echo "sample eval rc=$? (logs/sample_rf35mm_v3.log)"

echo "=== launching v4 warm-start training ==="
nohup python apps/dfdp_net.py \
  --config configs/dfdp_synthetic_train_512_v4_warmstart.yml --stage train \
  > logs/train_512_v4ws.log 2>&1 &
echo $! > /tmp/train_v4ws.pid
echo "v4 warm-start pid $(cat /tmp/train_v4ws.pid)"
