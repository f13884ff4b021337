from dpfx.config.schema import (
    Config,
    DataConfig,
    EncoderConfig,
    EvalConfig,
    FlowConfig,
    ImageEncoderConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
    load_config,
    config_from_dict,
)

__all__ = [
    "Config",
    "DataConfig",
    "EncoderConfig",
    "EvalConfig",
    "FlowConfig",
    "ImageEncoderConfig",
    "ModelConfig",
    "ParallelConfig",
    "TrainConfig",
    "load_config",
    "config_from_dict",
]
