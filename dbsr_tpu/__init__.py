"""dbsr_tpu — a TPU-native (JAX / XLA / Pallas) burst super-resolution framework.

A from-scratch re-design of the capabilities of the DBSR reference toolkit
(Deep Burst Super-Resolution, Bhat et al., CVPR 2021): multi-frame RAW burst
super-resolution with on-device synthetic burst generation, PWC-Net optical
flow alignment, attention-weighted fusion, and pixel-shuffle decoding.

Design stance (TPU-first, not a torch translation):
  * NHWC layouts everywhere (channels-last is the native TPU layout).
  * Pure-functional ops with explicit PRNG keys; everything jit-compiles.
  * On-device burst synthesis (inverse ISP -> affine burst -> mosaic -> noise)
    replaces the reference's CPU/cv2 dataloader-worker pipeline.
  * flax.linen models; optax optimizers; single jitted train step sharded over
    a `jax.sharding.Mesh` (data-parallel over ICI).
  * One custom kernel family: the PWC-Net correlation cost volume (Pallas, with
    an XLA shifted-window formulation as correctness oracle / autodiff path).

Package map (mirrors the reference's layer map, SURVEY.md section 1):
  ops/        jittable primitives: camera ISP, resampling, filtering, metrics,
              correlation cost volume, RAW packing.
  models/     flax modules: encoder / merging / decoder / DBSRNet, PWC-Net,
              spatial-color alignment, LPIPS.
  data/       on-device synthesis + host-side dataset readers and pipelines.
  parallel/   mesh construction and sharding policy.
  training/   train state, trainer loop (fail-safe restart), checkpointing,
              stats, tensorboard logging, actors.
  evaluation/ score computation / result saving matching the reference
              protocol (boundary_ignore=40, 2^14 quantization).
  configs/    config-as-code experiment files (run(settings) contract).
"""

__version__ = "0.1.0"
