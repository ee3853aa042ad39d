from . import convert  # noqa: F401
from .chunk import ChunkData  # noqa: F401
