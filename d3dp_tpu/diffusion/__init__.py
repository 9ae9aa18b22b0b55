from d3dp_tpu.diffusion.schedule import CosineSchedule, ddim_time_pairs
from d3dp_tpu.diffusion.d3dp import D3DP, D3DPConfig, flip_pose, make_lr_perm

__all__ = [
    "CosineSchedule",
    "ddim_time_pairs",
    "D3DP",
    "D3DPConfig",
    "flip_pose",
    "make_lr_perm",
]
