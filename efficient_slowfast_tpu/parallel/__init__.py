from .mesh import build_mesh, data_sharding, replicated  # noqa: F401
