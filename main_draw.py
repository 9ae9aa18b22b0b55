#!/usr/bin/env python
"""Qualitative multi-hypothesis plot entry point (reference-compatible CLI).

  python main_draw.py -k cpn_ft_h36m_dbb -c checkpoint --evaluate best.ckpt \
      -num_proposals 5 -sampling_timesteps 5 --viz-subject S11 --viz-action Walking
  python main_draw.py -d synthetic --nolog --viz-limit 3    # no-data smoke
"""

from d3dp_tpu.cli.main_draw import main

if __name__ == "__main__":
    main()
