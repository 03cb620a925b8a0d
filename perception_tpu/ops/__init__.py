from perception_tpu.ops.rasterizer import render_pose_batch  # noqa: F401
from perception_tpu.ops.pointcloud import depth_to_cloud_batch, observed_cloud_from_depth  # noqa: F401
