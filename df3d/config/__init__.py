from .config import Config, load_config, merge_overrides  # noqa: F401
from .presets import PRESETS, get_preset  # noqa: F401
