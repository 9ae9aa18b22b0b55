"""d3dp_tpu — a TPU-native (JAX/XLA/Pallas) framework for diffusion-based 3D
human pose estimation with multi-hypothesis aggregation.

Re-designed from scratch with the capabilities of the D3DP reference
(paTRICK-swk/D3DP, ICCV 2023): a MixSTE spatio-temporal transformer trained as
an x0-predicting denoiser conditioned on 2D keypoints, DDIM sampling of H
hypotheses x K iterations, and four aggregation modes (P-Best, P-Agg, J-Best,
J-Agg/JPMA).

Architecture is TPU-first:
  * pure-functional flax model, static shapes, fp32/bf16 selectable
  * DDIM sampling compiled to a single `lax.scan`, hypotheses folded into the
    batch dim, flip test-time-augmentation fused into one doubled-batch forward
  * on-device JPMA reprojection and all metric reductions
  * data parallel + tensor parallel via `jax.sharding.Mesh` + jit shardings
"""

__version__ = "0.1.0"
