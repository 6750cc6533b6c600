#!/bin/bash
# Round-3 TPU sequence (the chip admits ONE process at a time):
#   1. wait for the w256 150k-iter PSF fit (pid file /tmp/fit_w256.pid)
#   2. fidelity-gate the 150k student vs the real captures
#   3. speed-bench the pipeline variants with the w256 surrogate (idle chip)
#   4. launch the v4 warm-start DfDP training under the supervised runner
# Logs: logs/gate_w256_150k.log, logs/bench_w256_speed.log,
#       logs/train_512_v4ws_r3.log (pid -> /tmp/train_v4ws.pid)
set -u
cd "$(dirname "$0")/.."

if [ -s /tmp/fit_w256.pid ]; then
  FIT_PID=$(cat /tmp/fit_w256.pid)
  while kill -0 "$FIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== fit done ($(date -u +%FT%TZ)); gating w256 student ==="

timeout 1200 python scripts/gate_render_variants.py \
  --config configs/dfdp_by_sdirt_rf50mm_w256.yml \
  --variants scan fused_int8 > logs/gate_w256_150k.log 2>&1

echo "=== gate done ($(date -u +%FT%TZ)); speed bench ==="
timeout 1200 python scripts/bench_render_variants.py \
  --model mlp@256 --psfnet results/f4_fit_w256/psfnet_mlp@256 \
  --only pipe:scan pipe:fused pipe:fused_int8 \
  > logs/bench_w256_speed.log 2>&1

echo "=== bench done ($(date -u +%FT%TZ)); launching v4 warm-start ==="
nohup scripts/run_train_supervised.sh \
  configs/dfdp_synthetic_train_512_v4_warmstart.yml \
  > logs/train_512_v4ws_r3.log 2>&1 &
echo $! > /tmp/train_v4ws.pid
echo "v4ws supervisor pid $(cat /tmp/train_v4ws.pid)"
