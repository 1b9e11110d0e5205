from .build import MODEL_REGISTRY, build_model  # noqa: F401
from . import slowfast  # noqa: F401  (registers SlowFast, ResNet)
from . import cmda  # noqa: F401  (registers SlowFastDualAttention)

# Efficient 2D-inflated backbones register on import; keep imports lazy-safe.
for _mod in ("shufflenetv2", "shufflenet", "mobilenetv2", "ghostnet"):
    try:
        __import__(f"{__name__}.{_mod}")
    except ImportError:
        pass
