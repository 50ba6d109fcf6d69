from .fdtd import kspace_sim_2d

__all__ = ["kspace_sim_2d"]
