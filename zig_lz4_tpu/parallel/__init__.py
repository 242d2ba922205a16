from .mesh import blocks_mesh, local_device_count
from .sharded import ShardedFrameCodec

__all__ = ["blocks_mesh", "local_device_count", "ShardedFrameCodec"]
