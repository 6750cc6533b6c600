#!/usr/bin/env bash
# One-command CI: test suite (CPU-forced, 8 virtual devices for the sharding
# paths) + a bench smoke (CPU; asserts the two JSON metric lines parse).
#   bash scripts/ci.sh          fast tier (skips @pytest.mark.slow; <6 min
#                               on a 1-core host)
#   bash scripts/ci.sh --full   everything, incl. the compile-heavy
#                               parity/training-smoke tests (~36 min 1-core)
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

if [[ "${1:-}" == "--full" ]]; then
    python -m pytest tests/ -x -q
else
    python -m pytest tests/ -x -q -m "not slow"
fi

# Bench smoke: tiny-shape dry parse (the real bench runs on TPU; here we only
# guarantee the script imports, runs its pipeline, and emits parseable JSON).
# NOTE: must go through a file — `python bench.py | python - <<EOF` would feed
# the heredoc to the checker's stdin INSTEAD of the pipe, so it validates
# nothing (and the pipeline's first command can't fail the script anyway).
bench_out=$(mktemp)
SDIRT_BENCH_SMOKE=1 python bench.py > "$bench_out"
python - "$bench_out" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]) if l.strip().startswith("{")]
assert len(lines) == 2, f"expected 2 JSON metric lines, got {len(lines)}"
for l in lines:
    d = json.loads(l)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(d), d
    assert d["value"] > 0, d
print("bench smoke ok:", ", ".join(json.loads(l)["metric"] for l in lines))
EOF
rm -f "$bench_out"

echo "CI green."
