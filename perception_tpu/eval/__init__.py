from perception_tpu.eval.metrics import add_err, adi_err, compute_pose_metrics  # noqa: F401
from perception_tpu.eval.sampling import get_rotation_samples, sphere_fibonacci_grid  # noqa: F401
