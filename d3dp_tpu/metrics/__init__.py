from d3dp_tpu.metrics.mpjpe import (
    mpjpe,
    mpjpe_diffusion,
    mpjpe_diffusion_all_min,
    mpjpe_diffusion_reproj,
    mpjpe_diffusion_3dhp,
    n_mpjpe,
    mean_velocity_error,
    mean_velocity_error_train,
)
from d3dp_tpu.metrics.procrustes import (
    procrustes_align,
    p_mpjpe,
    p_mpjpe_diffusion,
    p_mpjpe_diffusion_all_min,
    p_mpjpe_diffusion_reproj,
)

__all__ = [
    "mpjpe",
    "mpjpe_diffusion",
    "mpjpe_diffusion_all_min",
    "mpjpe_diffusion_reproj",
    "mpjpe_diffusion_3dhp",
    "n_mpjpe",
    "mean_velocity_error",
    "mean_velocity_error_train",
    "procrustes_align",
    "p_mpjpe",
    "p_mpjpe_diffusion",
    "p_mpjpe_diffusion_all_min",
    "p_mpjpe_diffusion_reproj",
]
