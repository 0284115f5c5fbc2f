"""Model zoo. Importing registers every conf-addressable model
(reference: models/__init__.py:1-7 + @config_model decorators)."""

from . import layers  # noqa: F401
from . import vit  # noqa: F401
from .vit import DINOHead, DINOModel, VisionTransformer  # noqa: F401
