from .mesh import (make_mesh, das_sharded, das_sharded_pallas,
                   greens_sharded)

__all__ = ["make_mesh", "das_sharded", "das_sharded_pallas",
           "greens_sharded"]
