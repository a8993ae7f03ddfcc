"""Convert checkpoints into the framework's native Orbax format.

Sources: an HF-layout directory (unet/ vae/ text_encoder*/ safetensors) or a
single-file SGM checkpoint (SDXL-Lightning).  Conversion is slow (key
remapping + transposes); the Orbax output reloads directly into a
ModelBundle in seconds.

  python -m cfgpp_tpu.cli.convert_checkpoint --model sdxl \
      --src /ckpts/sdxl_hf --dst /ckpts/sdxl_native
  python -m cfgpp_tpu.cli.convert_checkpoint --model sdxl_lightning \
      --single_file ckpt/sdxl_lightning_4step_unet.safetensors --dst out/
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description="cfgpp_tpu checkpoint converter")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--src", type=str, default=None,
                        help="HF-layout checkpoint directory")
    parser.add_argument("--single_file", type=str, default=None,
                        help="single-file SGM safetensors checkpoint")
    parser.add_argument("--dst", type=str, required=True,
                        help="output directory (Orbax format)")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=("bfloat16", "float32"))
    args = parser.parse_args(argv)

    if bool(args.src) == bool(args.single_file):
        parser.error("provide exactly one of --src / --single_file")

    from cfgpp_tpu.engine import ModelBundle
    from cfgpp_tpu.weights.checkpoint import save_bundle

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.single_file:
        from cfgpp_tpu.weights.single_file import load_single_file_bundle
        bundle = ModelBundle.random_init(args.model, dtype=dtype, param_dtype=dtype)
        bundle = load_single_file_bundle(bundle, args.single_file)
    else:
        bundle = ModelBundle.from_pretrained(args.src, args.model,
                                             dtype=dtype, param_dtype=dtype)
    save_bundle(bundle, args.dst)
    print(f"saved native checkpoint to {args.dst}")


if __name__ == "__main__":
    main()
