#!/bin/bash
# Round-4 late chip queue: runs AFTER the crossover arms release the chip.
# 1. xl-bf16-remat roofline arm (newly defined at the 4000x16 shape that
#    compiles; the 4000x32 variant reproducibly 500s the remote-compile
#    helper — bench_queue/roofline.json r3 note)
# 2. HGT trace attribution at the shipped fast config (blockdiag + bf16
#    staging) to show where the bytes went after the round-4 work
# 3. Combined best-variant encoder arms (emax + bf16 staging)
set -u
cd "$(dirname "$0")/.."
ARMS="xl-bf16-remat" ARM_TIMEOUT=1500 bash scripts/run_roofline_per_arm.sh
echo "=== r4c: trace HGT-bf16st" >&2
timeout 1500 python scripts/hgt_attribution.py HGT-bf16st 4 \
    > bench_queue/trace_hgt_bf16st.out 2> bench_queue/trace_hgt_bf16st.err
echo "=== r4c: encoders HGT-emax-bf16st" >&2
timeout 1500 python scripts/bench_encoders.py HGT-emax-bf16st \
    > bench_queue/encoders_emax_bf16st.out 2> bench_queue/encoders_emax_bf16st.err
echo "=== r4c queue done ===" >&2
