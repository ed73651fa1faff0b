#!/bin/bash
# Run roofline arms ONE PER PROCESS: a tunnel-worker crash poisons the jax
# client for the rest of the process (every later arm errors instantly —
# the round-4 cascade), so each arm gets a fresh process + one retry.
set -u
cd "$(dirname "$0")/.."
ARMS=${ARMS:-"small-f32 small-bf16 small-f32-edge large-f32 large-bf16 \
large-f32-edge large-bf16-edge large-f32-edgezxp large-bf16-edgezxp \
large-f32-remat xl-f32 xl-bf16 xl-bf16-edge xl-f32-remat"}
for arm in $ARMS; do
    for attempt in 1 2; do
        echo "=== roofline arm $arm (attempt $attempt)" >&2
        timeout "${ARM_TIMEOUT:-1200}" python scripts/bench_roofline.py "$arm" \
            >> bench_queue/roofline_arms.out 2>> bench_queue/roofline_arms.err
        if python - "$arm" <<'EOF'
import json, sys
recs = {r["arm"]: r for r in json.load(open("bench_queue/roofline.json"))}
sys.exit(0 if "ms_per_step" in recs.get(sys.argv[1], {}) else 1)
EOF
        then echo "=== $arm ok" >&2; break
        else echo "=== $arm failed" >&2; sleep 20
        fi
    done
done
echo "=== roofline per-arm done ===" >&2
