#!/bin/bash
# Round-5b chip queue: waits for the seed-1 defaults arm (PID in $1), then
# runs the HGT stage_dtype convergence A/B (VERDICT r4 ask #4 / weak #5:
# "one full-training arm each" before MIGRATION recommends the bf16 flag),
# then regenerates the crossover tables with both seeds' curves.
# Metric runs, not timing runs — CPU-side concurrency is acceptable.
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID (seed-1 defaults arm)" >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [1/4] HGT f32-staging arm (24-piece, 50 epochs) ===" >&2
python scripts/parity_experiment.py jax \
    results_jax_hgt_f32.json checkpoints_parity_hgt_f32 --model HGT \
    > r5_jax_hgt_f32.log 2>&1
echo "rc=$?" >&2

echo "=== [2/4] HGT bf16-staging arm ===" >&2
python scripts/parity_experiment.py jax \
    results_jax_hgt_bf16.json checkpoints_parity_hgt_bf16 \
    --model HGT --hgt_stage_dtype bfloat16 \
    > r5_jax_hgt_bf16.log 2>&1
echo "rc=$?" >&2

echo "=== [3/4] crossover tables (seed 0 anchor + all arms) ===" >&2
python scripts/crossover_table.py results_torch_curve_l.jsonl \
    checkpoints_parity_l/test_curve.jsonl \
    checkpoints_parity_l_swept/test_curve.jsonl \
    checkpoints_parity_l_r5/test_curve.jsonl \
    > bench_queue/crossover_table.out 2>&1
echo "rc=$?" >&2

echo "=== [4/4] seed-1 pair: curve + endpoint table ===" >&2
CROSSOVER_OUT=bench_queue/crossover_s1.json \
python scripts/crossover_table.py results_torch_curve_l_s1.jsonl \
    checkpoints_parity_l_s1/test_curve.jsonl \
    > bench_queue/crossover_s1_table.out 2>&1
echo "rc=$?" >&2
python scripts/parity_table.py results_torch_l_s1.json \
    results_jax_default_l_s1.json \
    > bench_queue/seed1_endpoint_table.out 2>&1
echo "rc=$?" >&2
echo "=== r5b queue done ===" >&2
