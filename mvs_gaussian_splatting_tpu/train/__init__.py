from .config import ModelConfig, OptimizationConfig, PipelineConfig  # noqa: F401
from .optim import AdamState, adam_init, adam_update, group_lrs  # noqa: F401
