#!/usr/bin/env python
"""MPI-INF-3DHP train/eval entry point (reference-compatible CLI), with a
built-in Python PCK/AUC harness replacing the reference's MATLAB stage.

  python main_3dhp.py -c checkpoint/model_3dhp --nolog
  python main_3dhp.py -c checkpoint/model_3dhp --evaluate best_epoch.ckpt \
      -num_proposals 20 -sampling_timesteps 10
  python main_3dhp.py -d synthetic -e 2 --nolog     # no-data smoke run
"""

from d3dp_tpu.cli.main_3dhp import main

if __name__ == "__main__":
    main()
