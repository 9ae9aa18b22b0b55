"""Device-generation awareness for the kernel tile heuristics.

Every baked tile default in `ops/attention.py` / `ops/mlp.py` (the
`_tile_rows` targets, the stage/qkv batch tiles, the 128-frame MLP tile)
is a MEASURED value from one device generation: v5e (`device_kind`
"TPU v5 lite"; see PERFORMANCE.md tile-sweep tables). The numbers are
pure performance heuristics — correctness-safe on any generation — but
on v4/v5p/v6e they are untuned guesses, and inventing per-generation
tables without hardware to measure on would be worse than saying so.

So: the first kernel launch on a non-v5e TPU emits ONE advisory pointing
at the retune knobs (`scripts/tune_kernels.sh` sweeps; `D3DP_TB_*` /
`D3DP_MLP_TILE_*` env overrides pin winners). Suppressed when any
override is already set.
"""

import os
import warnings

import jax

TUNED_DEVICE_KIND = "TPU v5 lite"

_checked = False


def _override_env_set():
    return any(k.startswith(("D3DP_TB_", "D3DP_MLP_TILE_"))
               for k in os.environ)


def check_tile_generation():
    """One-time per process; called by every kernel entry point before a
    baked tile default is applied."""
    global _checked
    if _checked:
        return
    _checked = True
    dev = jax.devices()[0]
    if dev.platform != "tpu" or TUNED_DEVICE_KIND in dev.device_kind:
        return
    if _override_env_set():
        return
    warnings.warn(
        f"d3dp_tpu kernel tile defaults were tuned on {TUNED_DEVICE_KIND} "
        f"(v5e); this device is {dev.device_kind!r}. The defaults are "
        "correctness-safe but may be slow here — retune with "
        "scripts/tune_kernels.sh and pin winners via D3DP_TB_ATTN_T/"
        "D3DP_TB_ATTN_S/D3DP_TB_QKV_T/D3DP_TB_QKV_S and "
        "D3DP_MLP_TILE_SP/D3DP_MLP_TILE_TP/D3DP_MLP_TILE_ROWS.",
        stacklevel=3)
