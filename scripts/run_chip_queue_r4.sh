#!/bin/bash
# Round-4 one-shot chip measurement queue (run on an otherwise-idle machine).
# Decision-critical A/Bs first (conv_impl default choice), then the xl tier,
# sustained throughput, and the three-encoder trace attribution
# (VERDICT r3 asks #2, #5, #7).  Results land in bench_queue/.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_queue

run() {  # run <name> <cmd...>
    local name=$1; shift
    local tmo=${QUEUE_TIMEOUT:-2400}
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

run bench_r4        python bench.py
run roofline_r4     python scripts/bench_roofline.py \
    small-f32 small-bf16 small-f32-edge \
    large-f32 large-bf16 large-f32-edge large-bf16-edge \
    large-f32-edgezxp large-bf16-edgezxp large-f32-remat \
    xl-f32 xl-bf16 xl-bf16-edge xl-f32-remat
run hgt_variants_r4 python scripts/bench_hgt_variants.py
run encoders_r4     python scripts/bench_encoders.py \
    HybridGNN HybridGNN-edge HybridGNN-edgezxp \
    HGT HGT-emax MetricalGNN MetricalGNN-edge
run sustained_r4    python bench.py --sustained
run trace_hybrid    python scripts/hgt_attribution.py HybridGNN 4
run trace_hgt       python scripts/hgt_attribution.py HGT 4
run trace_metrical  python scripts/hgt_attribution.py MetricalGNN 4
echo "=== r4 queue done ===" >&2
