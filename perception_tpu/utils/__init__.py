from perception_tpu.utils.stats import EnvStats, StageTimer  # noqa: F401
