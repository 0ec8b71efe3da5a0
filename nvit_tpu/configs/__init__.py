from nvit_tpu.configs.schema import (
    AugmentationConfig,
    Config,
    DataConfig,
    OptimizerConfig,
    SchedulerConfig,
    SystemConfig,
    TrainingConfig,
    ViTConfig,
    WandbConfig,
    merge_dataclass,
)
from nvit_tpu.configs.loader import load_config, read_dotenv, get_secret

__all__ = [
    "AugmentationConfig",
    "Config",
    "DataConfig",
    "OptimizerConfig",
    "SchedulerConfig",
    "SystemConfig",
    "TrainingConfig",
    "ViTConfig",
    "WandbConfig",
    "merge_dataclass",
    "load_config",
    "read_dotenv",
    "get_secret",
]
