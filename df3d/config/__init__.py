from .config import (  # noqa: F401
    Config, apply_preset_overrides, load_config, merge_overrides,
)
from .presets import PRESETS, get_preset  # noqa: F401
