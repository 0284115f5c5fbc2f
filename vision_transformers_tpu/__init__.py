"""vision_transformers_tpu — a TPU-native vision-transformer training framework.

Rebuild of rosinality/vision-transformers-pytorch for TPU: flax model zoo
(ViT, DINO-DeiT, Swin, PVT, Halo, Twins-SVT, EfficientNet/V2, NFNet,
NF-EfficientNetV2), on-device data augmentation, sharded-jit data-parallel
training over a device mesh, and Pallas kernels for the hot attention blocks.

Importing this package populates the config registry (models, optimizers,
schedulers, checker components) so ``.conf`` files resolve their ``type:``
tags — the equivalent of the reference's import-time ``@config_model``
registration (reference: config.py:24, models/swin_transformer.py:236).
"""

from . import config  # noqa: F401
from .config import hocon, registry, schema  # noqa: F401
from .config.schema import ImageNetConfig, load_arg_config, load_config  # noqa: F401

# Registry population — import order mirrors dependency order.
from .train import schedule as _schedule  # noqa: F401
from .train import optim as _optim  # noqa: F401
from .train import checker as _checker  # noqa: F401
from . import models  # noqa: F401

__version__ = "0.1.0"
