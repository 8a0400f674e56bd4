from .common import create_logger, set_random_seed  # noqa: F401
