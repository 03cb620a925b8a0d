#!/bin/bash
# Round-4 perf measurement pass (VERDICT r3 asks #1, #4, #5) — run AFTER
# the accuracy queue releases the chip; one TPU process at a time.
#
#   1. bench.py with the new compile breakdown + cache-miss logging:
#      splits the 30-45 s first-call cost into trace / backend compile /
#      first-exec, which decides the cold-start lever.
#   2. profile_ablate.py: stage marginals at the shipped LOD-256 defaults
#      (the round-3 numbers predate the default flip).
#   3. PT_SUB_BBOX A/B: morton-local sub-chunk cull pricing at 32/64/128.
#
# Usage: bash benchmarks/r4_perf.sh
set -u
cd "$(dirname "$0")/.."
L() { echo "=== $(date +%H:%M:%S) $*"; }

L bench baseline + breakdown
PT_CACHE_DEBUG=1 BENCH_MODELS=bumpy1024 python bench.py \
    > /tmp/r4p_bench_base.json 2> /tmp/r4p_bench_base.err
L "base: $(cat /tmp/r4p_bench_base.json)"
sleep 20

L profile_ablate 2048
bash benchmarks/run_tpu.sh /tmp/r4p_ablate.log \
    python benchmarks/profile_ablate.py 2048
sleep 20

for SB in 64 32 128; do
    L "sub-bbox A/B: PT_SUB_BBOX=$SB"
    PT_SUB_BBOX=$SB BENCH_MODELS=bumpy1024 python bench.py \
        > /tmp/r4p_bench_sb$SB.json 2> /tmp/r4p_bench_sb$SB.err
    L "sb$SB: $(cat /tmp/r4p_bench_sb$SB.json)"
    sleep 20
done

L "tpu-lane tests (compiled kernels on the real chip)"
bash benchmarks/run_tpu.sh /tmp/r4p_tpulane.log \
    env PT_TPU_TESTS=1 python -m pytest tests/test_tpu_lane.py -q
L "tpu-lane: $(tail -1 /tmp/r4p_tpulane.log)"
L done
