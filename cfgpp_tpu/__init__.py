"""cfgpp_tpu — TPU-native CFG++ text-to-image sampling framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
CFGpp-diffusion/CFGpp (ICLR 2025, "CFG++: Manifold-constrained
Classifier-Free Guidance for Diffusion Models").

Layer map (bottom-up):
  kernels/    Pallas TPU flash-attention
  models/     Flax CLIP text encoders, UNet2DCondition (SD1.5 + SDXL), VAE
  weights/    safetensors -> param-pytree converters, CLIP BPE tokenizer
  schedules/  pure schedule tables (DDIM alphas, Karras sigmas, VE casts)
  solvers/    registry of pure per-step functions; samplers are lax.scan loops
  engine/     jit-compiled end-to-end text->image pipelines + callbacks
  parallel/   device-mesh sharding for batched / MS-COCO eval generation
  metrics/    FID / CLIP-score / LPIPS / PSNR evaluation
  cli/        text_to_img / inversion / text_to_mscoco / calculate_metrics
"""

__version__ = "0.1.0"
