from .train import train  # noqa: F401
from .test import test  # noqa: F401
