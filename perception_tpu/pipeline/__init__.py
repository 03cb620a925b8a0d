from perception_tpu.pipeline.scorer import ScorerConfig, score_pose_batch  # noqa: F401
from perception_tpu.pipeline.env import PerceptionEnv, RecognitionInput  # noqa: F401
