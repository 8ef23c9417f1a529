from vct.core.config import (  # noqa: F401
    CaptionConfig,
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    ServeConfig,
    SweepConfig,
    TrainConfig,
    apply_overrides,
    load_config,
)
from vct.core.registry import Registry  # noqa: F401
