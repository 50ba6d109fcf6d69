from .fdtd import kspace_sim_2d, kspace_sim_3d

__all__ = ["kspace_sim_2d", "kspace_sim_3d"]
