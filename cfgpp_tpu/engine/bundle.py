"""ModelBundle: a model family's modules + params + tokenizers, ready to run.

The TPU-native counterpart of the reference's pipeline loading
(`latent_diffusion.py:63-69`, `latent_sdxl.py:40-56`): instead of a HF
pipeline object, a bundle is an explicit pytree of Flax params plus the
module definitions — trivially shardable with jax.sharding and free of
framework globals.

Bundles come from `random_init` (benchmarks / tests — no checkpoint
downloads exist in this environment) or `from_pretrained` (safetensors
checkpoints via cfgpp_tpu.weights.convert).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cfgpp_tpu.configs import ModelBundleConfig, get_bundle_config
from cfgpp_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel
from cfgpp_tpu.weights.tokenizer import load_tokenizer


@dataclasses.dataclass
class ModelBundle:
    config: ModelBundleConfig
    unet: UNet2DConditionModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    text_encoder_2: Optional[CLIPTextModel] = None
    text_params_2: Optional[Any] = None
    tokenizer_2: Optional[Any] = None

    @property
    def family(self) -> str:
        return self.config.family

    @property
    def latent_channels(self) -> int:
        return self.config.vae.latent_channels

    @property
    def vae_scale_factor(self) -> int:
        return self.config.vae.scale_factor

    @property
    def vae_encode(self) -> AutoencoderKL:
        """fp32-compute VAE module for the ENCODE direction (same params).

        Only decode was the measured 92->83 ms bf16 win; encode feeds
        inversion source latents, where bf16 rounding would spend part of
        the <1e-2 per-step parity MAE budget for no wall-clock benefit
        (encode is off the hot path)."""
        return AutoencoderKL(self.config.vae, dtype=jnp.float32,
                             param_dtype=jnp.float32)

    def params(self):
        return {
            "unet": self.unet_params,
            "vae": self.vae_params,
            "text": self.text_params,
            "text2": self.text_params_2,
        }

    @classmethod
    def random_init(
        cls,
        config_or_name,
        seed: int = 0,
        dtype: jnp.dtype = jnp.bfloat16,
        param_dtype: jnp.dtype = jnp.bfloat16,
        tokenizer_dir: Optional[str] = None,
    ) -> "ModelBundle":
        cfg = (get_bundle_config(config_or_name)
               if isinstance(config_or_name, str) else config_or_name)
        key = jax.random.PRNGKey(seed)
        k_unet, k_vae, k_t1, k_t2 = jax.random.split(key, 4)

        unet = UNet2DConditionModel(cfg.unet, dtype=dtype, param_dtype=param_dtype)
        latent = cfg.default_resolution // cfg.vae.scale_factor
        ctx_dim = cfg.unet.cross_attention_dim
        unet_args = [jnp.zeros((1, latent, latent, cfg.unet.in_channels)),
                     jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, ctx_dim))]
        if cfg.unet.addition_embed_type == "text_time":
            pooled_dim = cfg.text_encoder_2.projection_dim
            unet_args += [jnp.zeros((1, pooled_dim)), jnp.zeros((1, 6))]
        unet_params = jax.jit(unet.init)(k_unet, *unet_args)

        # VAE params stay fp32 (decode quality / encode parity); compute
        # follows the bundle dtype — bf16 is overflow-safe (unlike the fp16
        # that motivated the reference's fp16-fix VAE, latent_sdxl.py:44)
        # and flax GroupNorm keeps its statistics in fp32.  Measured (r5,
        # evidence/vae_decode_r5.json): 99.1 -> 87.9 ms/img for the 1024^2
        # SDXL decode, image-space MAE 0.0021 vs fp32 (half a PNG quantum).
        vae_dtype = jnp.float32 if dtype == jnp.float32 else jnp.bfloat16
        vae = AutoencoderKL(cfg.vae, dtype=vae_dtype, param_dtype=jnp.float32)
        vae_params = jax.jit(vae.init)(
            k_vae, jnp.zeros((1, 64, 64, cfg.vae.in_channels)), k_vae)

        text = CLIPTextModel(cfg.text_encoder)
        text_params = jax.jit(text.init)(k_t1, jnp.zeros((1, 77), jnp.int32))
        tok = load_tokenizer(tokenizer_dir, vocab_size=cfg.text_encoder.vocab_size,
                             eos_token_id=cfg.text_encoder.eos_token_id)

        text2 = text_params_2 = tok2 = None
        if cfg.text_encoder_2 is not None:
            text2 = CLIPTextModel(cfg.text_encoder_2)
            text_params_2 = jax.jit(text2.init)(k_t2, jnp.zeros((1, 77), jnp.int32))
            # SDXL tokenizer_2 pads with "!" (id 0), not EOS.
            tok2 = load_tokenizer(tokenizer_dir, vocab_size=cfg.text_encoder_2.vocab_size,
                                  eos_token_id=cfg.text_encoder_2.eos_token_id,
                                  pad_token_id=0)

        return cls(config=cfg, unet=unet, unet_params=unet_params,
                   vae=vae, vae_params=vae_params,
                   text_encoder=text, text_params=text_params, tokenizer=tok,
                   text_encoder_2=text2, text_params_2=text_params_2, tokenizer_2=tok2)

    def quantized(self, mode: str = "dense") -> "ModelBundle":
        """Opt-in int8 W8A8 UNet (see models/quant.py): returns a new bundle
        whose UNet runs transformer projections through the fused Pallas
        int8 kernel (kernels/int8_matmul.py).  ``mode="dense"`` (default)
        keeps convs bf16 — XLA's int8-conv lowering measured slower than
        bf16 in-context; ``mode="all"`` additionally quantizes resnet
        convs.  Numerics differ from the exact bf16 path — never the
        default."""
        if mode not in ("dense", "all"):
            raise ValueError(f"quantized mode must be 'dense' or 'all', "
                             f"got {mode!r}")
        from cfgpp_tpu.weights.quantize import quantize_unet_params
        unet_q = UNet2DConditionModel(self.config.unet, dtype=self.unet.dtype,
                                      param_dtype=self.unet.param_dtype,
                                      quant=(True if mode == "all" else mode))
        return dataclasses.replace(
            self, unet=unet_q,
            unet_params=quantize_unet_params(self.unet_params, mode=mode))

    @classmethod
    def from_pretrained(cls, checkpoint_dir: str, config_or_name,
                        dtype: jnp.dtype = jnp.bfloat16,
                        param_dtype: jnp.dtype = jnp.bfloat16) -> "ModelBundle":
        """Load converted safetensors weights (see cfgpp_tpu.weights.convert)."""
        from cfgpp_tpu.weights.convert import load_bundle_params
        bundle = cls.random_init(config_or_name, dtype=dtype, param_dtype=param_dtype,
                                 tokenizer_dir=checkpoint_dir)
        return load_bundle_params(bundle, checkpoint_dir)
