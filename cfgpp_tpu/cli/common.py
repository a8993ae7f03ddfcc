"""Shared CLI plumbing: bundle construction + engine creation."""

from __future__ import annotations

import argparse
from typing import Optional

import jax.numpy as jnp

from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

SD_MODELS = ("sd15", "sd20", "sd21", "sd21_v", "tiny_sd")
SDXL_MODELS = ("sdxl", "sdxl_lightning", "tiny_sdxl")
ALL_MODELS = SD_MODELS + SDXL_MODELS

# Reference default negative prompt (examples/text_to_img.py:17).
DEFAULT_NULL_PROMPT = ("low quality,jpeg artifacts,blurry,poorly drawn,ugly,"
                       "worst quality,")


def add_common_args(parser: argparse.ArgumentParser, default_method: str = "ddim",
                    default_nfe: int = 50) -> None:
    parser.add_argument("--workdir", type=str, required=False)
    parser.add_argument("--device", type=str, default="tpu",
                        help="informational; JAX picks the backend")
    parser.add_argument("--null_prompt", type=str, default=DEFAULT_NULL_PROMPT)
    parser.add_argument("--prompt", type=str, default="")
    parser.add_argument("--cfg_guidance", type=float, default=7.5)
    parser.add_argument("--method", type=str, default=default_method)
    parser.add_argument("--model", type=str, default="sd15", choices=ALL_MODELS)
    parser.add_argument("--NFE", type=int, default=default_nfe)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="directory with converted safetensors weights; "
                             "omitted -> random-init weights (no downloads "
                             "exist in this environment)")
    parser.add_argument("--light_ckpt", type=str, default=None,
                        help="single-file SGM-layout safetensors checkpoint "
                             "(SDXL-Lightning), e.g. "
                             "ckpt/sdxl_lightning_4step_unet.safetensors")
    parser.add_argument("--resolution", type=int, default=None)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=("bfloat16", "float32"))
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of the run into "
                             "this directory (view with xprof/TensorBoard)")
    parser.add_argument("--quant", type=str, default=None,
                        choices=("dense", "all"),
                        help="opt-in int8 W8A8 UNet (numerics differ from "
                             "the exact bf16 path): 'dense' quantizes the "
                             "transformer projections through the fused "
                             "Pallas int8 matmul (the configuration that "
                             "beats bf16 end-to-end on v5e), 'all' also "
                             "quantizes resnet convs")


def maybe_profile(args):
    """Context manager: jax.profiler trace when --profile_dir is set."""
    import contextlib

    if getattr(args, "profile_dir", None):
        from cfgpp_tpu.utils.profiling import trace
        return trace(args.profile_dir)
    return contextlib.nullcontext()


def build_engine(args, nfe: Optional[int] = None) -> DiffusionEngine:
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if getattr(args, "light_ckpt", None):
        from cfgpp_tpu.weights.single_file import load_single_file_bundle
        # --ckpt_dir (when given) supplies the base text encoders/VAE; the
        # single-file checkpoint overlays the distilled UNet on top —
        # previously ckpt_dir was silently ignored here
        if args.ckpt_dir:
            bundle = ModelBundle.from_pretrained(args.ckpt_dir, args.model,
                                                 dtype=dtype, param_dtype=dtype)
        else:
            bundle = ModelBundle.random_init(args.model, seed=0, dtype=dtype,
                                             param_dtype=dtype)
        bundle = load_single_file_bundle(bundle, args.light_ckpt)
    elif args.ckpt_dir:
        bundle = ModelBundle.from_pretrained(args.ckpt_dir, args.model,
                                             dtype=dtype, param_dtype=dtype)
    else:
        bundle = ModelBundle.random_init(args.model, seed=0, dtype=dtype,
                                         param_dtype=dtype)
    if getattr(args, "quant", None):
        bundle = bundle.quantized(mode=args.quant)
    return DiffusionEngine(bundle, solver=args.method, nfe=nfe or args.NFE)
