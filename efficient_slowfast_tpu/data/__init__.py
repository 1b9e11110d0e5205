from .build import DATASET_REGISTRY, build_dataset  # noqa: F401
from . import datasets  # noqa: F401  (registers Kinetics/Jester/Synthetic)
from . import ava_dataset  # noqa: F401  (registers Ava)
from . import frame_datasets  # noqa: F401  (registers Ssv2, Charades)
from .loader import construct_loader, shuffle_dataset  # noqa: F401
