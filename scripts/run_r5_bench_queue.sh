#!/bin/bash
# Round-5 chip bench window — run ONLY on an otherwise idle machine
# (no parity runs in flight; tunnel timings are polluted by any
# concurrent python).  Serial by design.
set -u
cd "$(dirname "$0")/.."
BQ=bench_queue
mkdir -p "$BQ"

echo "=== [1/5] encoder table (kv-merge + gmax + bf16st arms) ===" >&2
timeout 3600 python scripts/bench_encoders.py \
    HybridGNN MetricalGNN HGT HGT-gmax HGT-bf16st HGT-gmax-bf16st \
    > "$BQ/encoders_r5.out" 2> "$BQ/encoders_r5.err"
echo "rc=$?" >&2

echo "=== [2/5] torch-CPU baseline re-measure (8-score workload) ===" >&2
timeout 1800 python scripts/bench_torch_reference.py \
    > "$BQ/torch_baseline_r5.out" 2>&1
echo "rc=$?" >&2

echo "=== [3/5] headline bench + sustained + breakdown ===" >&2
timeout 3600 python bench.py --sustained \
    > "$BQ/bench_r5.out" 2> "$BQ/bench_r5.err"
echo "rc=$?" >&2

echo "=== [4/5] roofline re-measure at the fixed workload ===" >&2
timeout 7200 python scripts/bench_roofline.py \
    large-f32 large-bf16 large-bf16-edge xl-bf16 \
    > "$BQ/roofline_r5.out" 2> "$BQ/roofline_r5.err"
echo "rc=$?" >&2

echo "=== [5/5] bytes model vs re-measured roofline ===" >&2
timeout 1800 python scripts/bytes_model.py large-f32 large-bf16 xl-bf16 \
    > "$BQ/bytes_model_r5.out" 2>&1
echo "rc=$?" >&2
echo "=== r5 bench queue done ===" >&2
