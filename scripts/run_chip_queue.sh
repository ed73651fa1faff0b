#!/bin/bash
# One-shot on-chip measurement queue (run on an otherwise-idle machine).
# Each step tolerates the tunnel worker's intermittent crash/restart by
# retrying once; results land in bench_queue/.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_queue

run() {  # run <name> <cmd...>
    local name=$1; shift
    local tmo=${QUEUE_TIMEOUT:-1800}
    echo "=== $name: $*" >&2
    for attempt in 1 2; do
        if timeout "$tmo" "$@" >"bench_queue/$name.out" 2>"bench_queue/$name.err"; then
            echo "=== $name ok (attempt $attempt)" >&2
            tail -2 "bench_queue/$name.out" >&2
            return 0
        fi
        echo "=== $name FAILED attempt $attempt (rc=$?)" >&2
        sleep 30
    done
    return 1
}

run bench            python bench.py
run encoders         python scripts/bench_encoders.py HybridGNN HybridGNN-pallas HGT HGT-emax HGT-emax-pallas MetricalGNN
run inference        python scripts/bench_inference.py 10000
run scan_k12         python scripts/bench_scan_ab.py 12
# task-metric arms for the other two encoder families (same synthetic
# corpus + budget as RESULTS.md's HybridGNN arm and torch anchor).
# Metrics are platform-independent; skip if the forced-CPU outage runs
# already produced them (PARITY_PLATFORM=cpu).
[ -f results_jax_hgt.json ] || \
QUEUE_TIMEOUT=7200 run parity_hgt       python scripts/parity_experiment.py jax results_jax_hgt.json ckpt_hgt --model HGT --hgt_group_mode emax --lr 1e-3 --dropout 0.0
[ -f results_jax_metrical.json ] || \
QUEUE_TIMEOUT=7200 run parity_metrical  python scripts/parity_experiment.py jax results_jax_metrical.json ckpt_metrical --model MetricalGNN --lr 1e-3 --dropout 0.0
echo "=== queue done ===" >&2
