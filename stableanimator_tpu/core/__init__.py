from stableanimator_tpu.core.config import (
    UNetConfig,
    VAEConfig,
    PoseNetConfig,
    FaceEncoderConfig,
    CLIPVisionConfig,
    SchedulerConfig,
    PipelineConfig,
    TrainConfig,
)
