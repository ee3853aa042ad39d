from . import halo, mesh, sharding, sp  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from .sp import sequence_parallel  # noqa: F401
