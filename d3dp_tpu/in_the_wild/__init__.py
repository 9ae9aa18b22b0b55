from d3dp_tpu.in_the_wild.inference import inference_video, get_detector_2d

__all__ = ["inference_video", "get_detector_2d"]
