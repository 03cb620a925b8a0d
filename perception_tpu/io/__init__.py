from perception_tpu.io.poses_file import (  # noqa: F401
    read_poses_file,
    write_cost_dump,
    write_output_poses,
    write_output_stats,
)
