#!/usr/bin/env python
"""Human3.6M train/eval entry point (reference-compatible CLI).

Usage examples (same flag surface as the reference main.py):
  python main.py -k cpn_ft_h36m_dbb -c checkpoint/model_h36m --nolog
  python main.py -k cpn_ft_h36m_dbb --evaluate best_epoch.ckpt \
      -num_proposals 5 -sampling_timesteps 5 -b 4
  python main.py -d synthetic -e 2 --nolog       # no-data smoke run
"""

from d3dp_tpu.cli.main_h36m import main

if __name__ == "__main__":
    main()
