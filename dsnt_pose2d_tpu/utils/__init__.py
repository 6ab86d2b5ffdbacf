"""Config system and misc utilities."""

from .config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    config_from_json,
    config_to_json,
)

__all__ = [
    "Config",
    "DataConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "config_from_json",
    "config_to_json",
]
