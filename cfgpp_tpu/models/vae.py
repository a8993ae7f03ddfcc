"""AutoencoderKL (SD / SDXL fp16-fix VAE) in Flax, NHWC.

Replaces the external `diffusers.AutoencoderKL` (`latent_diffusion.py:64,
117-129`, `latent_sdxl.py:44,150-164`).  Encoder is needed for inversion
(`encode(x).latent_dist.sample() * scaling_factor`), decoder for every
generation.  On TPU the fp16-overflow problem the reference works around
with the "fp16-fix" VAE does not exist: bf16 shares fp32's exponent range.
We still default the decoder to fp32 compute for output quality; the
scaling-factor handling lives in the engine.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cfgpp_tpu.configs import VAEConfig
from cfgpp_tpu.models.attention import sdpa


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(nn.Conv, self.out_channels, (3, 3), padding=1,
                                 dtype=self.dtype, param_dtype=self.param_dtype)
        gn = functools.partial(nn.GroupNorm, num_groups=self.groups, epsilon=1e-6,
                               dtype=self.dtype, param_dtype=self.param_dtype)
        h = conv(name="conv1")(nn.silu(gn(name="norm1")(x)))
        h = conv(name="conv2")(nn.silu(gn(name="norm2")(h)))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head self-attention over H*W tokens (diffusers mid-block attn)."""
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        dense = functools.partial(nn.Dense, c, use_bias=True, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        q = dense(name="to_q")(x)[:, :, None, :]   # [B, N, 1 head, C]
        k = dense(name="to_k")(x)[:, :, None, :]
        v = dense(name="to_v")(x)[:, :, None, :]
        # dispatching attention: at 1024^2 decode this is a 16384-token
        # sequence — the flash path avoids materializing the NxN scores
        out = sdpa(q, k, v).reshape(b, h * w, c)
        out = dense(name="to_out")(out)
        return out.reshape(b, h, w, c) + residual


class _MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        kw = dict(groups=self.groups, dtype=self.dtype, param_dtype=self.param_dtype)
        x = VAEResnetBlock(self.channels, name="resnets_0", **kw)(x)
        x = VAEAttentionBlock(self.channels, name="attentions_0", **kw)(x)
        return VAEResnetBlock(self.channels, name="resnets_1", **kw)(x)


class VAEEncoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rkw = dict(groups=cfg.norm_num_groups, **kw)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, name=f"down_blocks_{i}_resnets_{j}", **rkw)(x)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers Downsample2D in the VAE pads asymmetrically (0,1)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_blocks_{i}_downsamplers_0_conv", **kw)(x)
        x = _MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                      self.dtype, self.param_dtype, name="mid_block")(x)
        x = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                                 name="conv_norm_out", **kw)(x))
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, name="conv_out", **kw)(x)


class VAEDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rkw = dict(groups=cfg.norm_num_groups, **kw)
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in", **kw)(z)
        x = _MidBlock(rev[0], cfg.norm_num_groups, self.dtype, self.param_dtype,
                      name="mid_block")(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, name=f"up_blocks_{i}_resnets_{j}", **rkw)(x)
            if i < len(rev) - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), padding=1,
                            name=f"up_blocks_{i}_upsamplers_0_conv", **kw)(x)
        x = nn.silu(nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                                 name="conv_norm_out", **kw)(x))
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(x)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode latent -> image.  Both NHWC."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(config=self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = VAEEncoder(name="encoder", **kw)
        self.decoder = VAEDecoder(name="decoder", **kw)
        ckw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name="quant_conv", **ckw)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv", **ckw)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_latent(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """latent_dist.sample(): mean + std * N(0,1).  latent_diffusion.py:121."""
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return self.decode(self.sample_latent(x, key))
