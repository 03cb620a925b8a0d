"""perception_tpu — a TPU-native pose-estimation-via-search framework.

A from-scratch JAX/XLA/Pallas re-design of the PERCH 2.0 system
(pose estimation by rendering + scoring thousands of candidate object poses
against an observed RGB-D cloud). The reference implementation
(`/root/reference`, CUDA/C++/ROS) renders candidate-pose depth images with a
CUDA rasterizer, converts them to point clouds, refines with batched GICP and
scores with an occlusion-aware explained/unexplained point cost.

Here the whole candidate-scoring pipeline is a single pure-functional jitted
program over static shapes:

    render -> unproject -> (GICP refine) -> 1-NN -> cost -> argmin

with the pose axis shardable across a `jax.sharding.Mesh` for multi-chip
scaling (the reference's MPI scatter/gather and CUDA-batch loops collapse
into SPMD sharding annotations).

Key representational choices (vs the reference):
  * depth images are int32 centimetres (reference: same quantisation,
    cuda_renderer/.../image_renderer.cuh:129), rendered only at the strided
    sample points actually consumed downstream;
  * the racy per-pixel spin-lock z-buffer becomes a deterministic packed
    (depth, triangle-id) min-reduction;
  * dynamic cloud compaction becomes static-capacity clouds + validity masks;
  * the observed cloud is label-partitioned into fixed-size segments for
    segmentation-aware nearest-neighbour queries
    (reference: fast_gicp label-sorted ranges, renderer.cu:1674-1686).
"""

__version__ = "0.1.0"

from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig  # noqa: F401
