#!/bin/bash
# Round-4 perf pass, stage 2 — chained after r4_perf.sh releases the chip.
#
#   1. compile_profile.py: which pipeline component owns the 89.6 s cold
#      backend compile (VERDICT ask #5 wants <= 15 s).
#   2. Ladder pricing of the ICP iteration bound (the post-LOD-flip
#      dominant stage: profile_ablate shows icp20 = 17.6 ms of the 34 ms
#      batch): 20 / 12 / 8 vs the default-30 entry, 150 scenes.
#   3. Confirm bench at BENCH_ICP_ITERS=12 on bumpy1024 (target: >= 70k).
#
# Usage: bash benchmarks/r4_perf2.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
L() { echo "=== $(date +%H:%M:%S) $*"; }

if [ $# -ge 1 ]; then
    L "waiting for pid $1 to release the chip"
    while kill -0 "$1" 2>/dev/null; do sleep 30; done
    sleep 30
fi

L compile_profile 2048
bash benchmarks/run_tpu.sh /tmp/r4p2_compile.log \
    python benchmarks/compile_profile.py 2048
sleep 20

L "ladder: icp iteration bound + crop pricing (150 scenes)"
python benchmarks/accuracy_ladder.py 150 \
    --rungs=icp_iters_20,icp_iters_12,icp_iters_8,icp_crop_128 \
    > /tmp/r4p2_ladder.log 2>&1
tail -8 /tmp/r4p2_ladder.log
sleep 20

L "ladder: capstone on the exact fused D2D refiner (@kinect)"
python benchmarks/accuracy_ladder.py 150 --rungs=capstone_d2dexact \
    --noise=kinect --timeout=1800 \
    > /tmp/r4p2_capstone.log 2>&1
tail -4 /tmp/r4p2_capstone.log
sleep 20

L "bench confirm: BENCH_ICP_ITERS=12 bumpy1024"
BENCH_ICP_ITERS=12 BENCH_MODELS=bumpy1024 python bench.py \
    > /tmp/r4p2_bench_i12.json 2> /tmp/r4p2_bench_i12.err
L "i12: $(cat /tmp/r4p2_bench_i12.json)"
L done
