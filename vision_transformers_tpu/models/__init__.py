"""Model zoo. Importing registers every conf-addressable model
(reference: models/__init__.py:1-7 + @config_model decorators)."""

from . import layers  # noqa: F401
from . import vit  # noqa: F401
from . import swin  # noqa: F401
from . import pvt  # noqa: F401
from . import twins  # noqa: F401
from . import halo  # noqa: F401
from . import efficientnet  # noqa: F401
from . import nfnet  # noqa: F401
from . import nfefficientnet  # noqa: F401
from .efficientnet import EfficientNet  # noqa: F401
from .halo import HaloTransformer  # noqa: F401
from .nfefficientnet import NFEfficientNet  # noqa: F401
from .nfnet import NFNet  # noqa: F401
from .pvt import PyramidVisionTransformer  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
from .twins import TwinsSVT  # noqa: F401
from .vit import DINOHead, DINOModel, VisionTransformer  # noqa: F401
