#!/usr/bin/env python
"""In-the-wild (COCO-layout 2D keypoints) H36M train/eval entry point.

The reference main_in_the_wild.py is main.py retargeted at
`-k detectron_pt_coco` keypoints with Protocol-2 metrics always on and
in-the-wild training defaults (stride 1, 120 epochs, lr 4e-5, lrd 0.99,
num_proposals 5 — in_the_wild/arguments_diffusion.py). Same here, sharing
one orchestration core instead of a 1050-line clone.

For direct video inference use d3dp_tpu.in_the_wild.inference_video.
"""

from d3dp_tpu.cli.arguments import parse_args, apply_platform_args
from d3dp_tpu.cli import main_h36m


def main(argv=None):
    args = parse_args(argv, in_the_wild=True)
    args.p2 = True  # reference main_in_the_wild.py always reports P2
    apply_platform_args(args)
    main_h36m.run_with_args(args)


if __name__ == "__main__":
    main()
