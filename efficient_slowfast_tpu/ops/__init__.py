from . import attention, conv, norm, pool  # noqa: F401
