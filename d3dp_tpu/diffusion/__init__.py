from d3dp_tpu.diffusion.schedule import CosineSchedule, ddim_time_pairs

__all__ = ["CosineSchedule", "ddim_time_pairs"]
