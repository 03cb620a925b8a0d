from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig  # noqa: F401
from perception_tpu.core.pose import ContPose  # noqa: F401
from perception_tpu.core.mesh import MeshModel, ModelBank  # noqa: F401
