from .mesh import make_mesh, das_sharded, greens_sharded

__all__ = ["make_mesh", "das_sharded", "greens_sharded"]
