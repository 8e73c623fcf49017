"""lama_tpu — a TPU-native (JAX/XLA/Pallas/pjit) large-mask inpainting framework.

A ground-up re-design of the capabilities of advimman/lama (LaMa: Resolution-robust
Large Mask Inpainting with Fourier Convolutions, WACV 2022) for TPU hardware:

- NHWC layouts, bfloat16-friendly compute, fp32 spectral path
- the whole FFC generator forward is a single XLA program
- GAN training (G step + D step + R1 double-grad + EMA) is ONE jitted function
- scaling via `jax.sharding.Mesh` + NamedSharding (data / spatial axes), not DDP
- host-side numpy/cv2 data+mask pipeline feeding device prefetch

Component map mirrors the reference (see SURVEY.md):
  lama_tpu.ops         — conv/norm/pad/resize/fft building blocks (+ Pallas kernels)
  lama_tpu.models      — FFC generator family, pix2pixhd family, discriminators, aux nets
  lama_tpu.losses      — masked L1, adversarial R1, feature matching, perceptual
  lama_tpu.data        — datasets, transforms, procedural mask synthesis
  lama_tpu.evaluation  — SSIM/LPIPS/FID scores, evaluator harness, refinement
  lama_tpu.training    — train state, fused GAN train step, trainer loop, checkpoints
  lama_tpu.parallel    — mesh construction and sharding rules
  lama_tpu.config      — minimal hydra/omegaconf-like YAML config composition
"""

__version__ = "0.1.0"
