from difashion_tpu.core.checkpoint import CheckpointStore
from difashion_tpu.core.config import (
    CLIPTextConfig,
    Config,
    DataConfig,
    GenerationConfig,
    ModelConfig,
    MutualEncoderConfig,
    SchedulerConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
)
from difashion_tpu.core.logging import (
    MetricLogger,
    StepTimer,
    profile_trace,
    setup_logging,
)

__all__ = [
    "CheckpointStore",
    "CLIPTextConfig",
    "Config",
    "DataConfig",
    "GenerationConfig",
    "ModelConfig",
    "MutualEncoderConfig",
    "SchedulerConfig",
    "TrainConfig",
    "UNetConfig",
    "VAEConfig",
    "MetricLogger",
    "StepTimer",
    "profile_trace",
    "setup_logging",
]
