from protopformer_tpu.core.config import (
    BackboneConfig,
    PPNetConfig,
    OptimConfig,
    DataConfig,
    TrainConfig,
    ExperimentConfig,
    BACKBONE_PRESETS,
    backbone_preset,
)
