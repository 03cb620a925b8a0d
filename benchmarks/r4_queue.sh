#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 asks #2, #3, #6, #9).
# Runs the outstanding accuracy-ladder rungs serially on the tunnel TPU —
# one TPU process at a time (see benchmarks/run_tpu.sh header for why).
# Each ladder invocation already persists per-rung (merge-on-write), so
# killing this script loses at most the rung in flight.
#
# Order: cheap high-value rungs first, the slow capstone last, so an
# outage or wall-clock cut loses the least.
#
# Usage: bash benchmarks/r4_queue.sh [SCENES]   (default 150)
set -u
cd "$(dirname "$0")/.."
S=${1:-150}
L() { echo "=== $(date +%H:%M:%S) $*" ; }

# 9: fresh default at the shipped defaults on the real chip.
L default@tpu
python benchmarks/accuracy_ladder.py "$S" --rungs=default --tag=@tpu
sleep 20

# 6: the exact full-covariance fused GICP mode, noise-free and @kinect.
L fused_d2d_exact
python benchmarks/accuracy_ladder.py "$S" --rungs=fused_d2d_exact
sleep 20
L fused_d2d_exact@kinect
python benchmarks/accuracy_ladder.py "$S" --rungs=fused_d2d_exact --noise=kinect
sleep 20

# 2: the 150-scene TPU confirmation of the QEM + LOD-256 default flip.
L hires-noise-free
python benchmarks/accuracy_ladder.py "$S" \
    --rungs=hires_qem_lod0,hires_qem_lod256,hires_qem_lod128,hires_cluster_lod0 \
    --timeout=2400
sleep 20
L hires@kinect
python benchmarks/accuracy_ladder.py "$S" --rungs=hires_qem_lod0,hires_qem_lod256 \
    --noise=kinect --timeout=2400
sleep 20

# 3: the @kinect validation of the composed accuracy menu.
L kinect-menu
python benchmarks/accuracy_ladder.py "$S" --rungs=samples_240,refine_rounds_2 \
    --noise=kinect --timeout=2400
sleep 20
L capstone@kinect
python benchmarks/accuracy_ladder.py "$S" --rungs=capstone_color_refine2_s240 \
    --noise=kinect --timeout=3600

L done
