#!/bin/bash
# Round-4 crossover study (VERDICT r3 asks #1 path b + #6): 120-piece corpus,
# verbatim reference recipe (lr 5e-3, dropout 0.3, 50 epochs ~= 3050 steps),
# both frameworks eval'd on the SAME held-out split every 5 epochs.
# The torch anchor (CPU) and the jax default arm (chip) run CONCURRENTLY —
# these are metric runs, not timing runs.  After the default arm, the swept
# arm (lr 1e-3, same dropout) reuses the chip.  Curves append incrementally,
# so a truncated run still yields every completed budget point.
set -u
cd "$(dirname "$0")/.."
export PARITY_DATA_DIR="$PWD/data_synth_l" PARITY_EVAL_EVERY=5

PARITY_TAG=_l nohup python scripts/parity_experiment.py torch \
    > r4_torch_l.log 2>&1 &
TORCH_PID=$!
echo "torch anchor pid $TORCH_PID" >&2

python scripts/parity_experiment.py jax \
    results_jax_default_l.json checkpoints_parity_l \
    > r4_jax_l.log 2>&1
echo "jax default arm done rc=$?" >&2

python scripts/parity_experiment.py jax \
    results_jax_lr1e3_d03_l.json checkpoints_parity_l_swept --lr 0.001 \
    > r4_jax_l_swept.log 2>&1
echo "jax swept arm done rc=$?" >&2

wait $TORCH_PID
echo "torch anchor done rc=$?" >&2
python scripts/crossover_table.py results_torch_curve_l.jsonl \
    checkpoints_parity_l/test_curve.jsonl \
    checkpoints_parity_l_swept/test_curve.jsonl \
    > bench_queue/crossover_table.out 2>&1
echo "=== crossover done ===" >&2
