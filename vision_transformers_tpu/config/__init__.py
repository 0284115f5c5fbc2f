from . import hocon, registry, schema  # noqa: F401
from .registry import TypedConfig, register, build  # noqa: F401
from .schema import ImageNetConfig, load_arg_config, load_config  # noqa: F401
