from .mesh import make_mesh, tile_sharding
from .grid_decode import sharded_unci_decode, build_sharded_pipeline

__all__ = ["make_mesh", "tile_sharding", "sharded_unci_decode",
           "build_sharded_pipeline"]
