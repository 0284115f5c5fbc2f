from .logging import get_logger, is_primary  # noqa: F401
