"""Fused normalization modules backed by Pallas kernels.

Drop-ins for `nn.GroupNorm` / `nn.LayerNorm` with identical parameter
trees (scale/bias), fp32 statistics, and optional fused epilogues (SiLU,
[B, C] bias pre-add, deferred residual add).

The UNet/VAE deliberately keep plain `nn.GroupNorm`/`nn.LayerNorm`: every
integration variant of these modules was measured SLOWER in the SDXL step
on v5e, because XLA fuses the normalize into consumer convs/dots for free
and responds to interleaved custom calls by degrading its convolution
layouts (full numbers in kernels/group_norm.py and kernels/layer_norm.py).
These modules serve norm sites outside that layout-sensitive graph.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

import jax

from cfgpp_tpu.kernels.group_norm import group_norm
from cfgpp_tpu.kernels.layer_norm import (apply_norm_stats, layer_norm,
                                          layer_norm_stats, layer_norm_xla,
                                          residual_layer_norm_stats)


class ResidualFusedLayerNorm(nn.Module):
    """Transformer residual add + LayerNorm with Pallas-fused statistics.

    ``(x, pending) -> (z, LN(z))`` where ``z = x + pending`` (or just x).
    One streaming kernel pass writes z and its per-row (mean, rstd); the
    normalize stays in jnp so XLA fuses it into the q/k/v projection reads.
    Parameter tree is identical to `nn.LayerNorm` (scale/bias), so weight
    converters are unaffected.  See kernels/layer_norm.py for the measured
    rationale.
    """

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pending: jnp.ndarray | None = None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        x = x.astype(self.dtype)
        n = x.shape[1]
        if jax.default_backend() != "tpu" or n % 8 or n < 8:
            z = x if pending is None else x + pending.astype(self.dtype)
            return z, layer_norm_xla(z, scale, bias, self.epsilon)
        if pending is None:
            z, stats = x, layer_norm_stats(x, self.epsilon)
        else:
            z, stats = residual_layer_norm_stats(x, pending.astype(x.dtype),
                                                 self.epsilon)
        return z, apply_norm_stats(z, stats, scale, bias)


class FusedLayerNorm(nn.Module):
    """Drop-in for `nn.LayerNorm` (same scale/bias param tree).  On TPU the
    per-row statistics run as a Pallas kernel (one streaming read) and the
    normalize stays in jnp so XLA fuses it into the q/k/v projection reads
    — XLA's own LayerNorm lowering moves ~5x the tensor bytes (see
    cfgpp_tpu/kernels/layer_norm.py)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if x.ndim != 3:
            raise ValueError(f"FusedLayerNorm expects [B, N, C], got {x.shape}")
        return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


class FusedGroupNorm(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-5
    act: str | None = None          # None | "silu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 add: jnp.ndarray | None = None) -> jnp.ndarray:
        """``add`` ([B, C]) is fused into the normalization input (the
        resnet time-embedding bias), saving its HBM round-trip."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        shape = x.shape
        if x.ndim == 4:                       # NHWC -> token-major (free)
            x = x.reshape(shape[0], shape[1] * shape[2], c)
        elif x.ndim != 3:
            raise ValueError(f"FusedGroupNorm expects 3D/4D input, got {x.shape}")
        y = group_norm(x.astype(self.dtype), scale, bias, self.num_groups,
                       self.epsilon, self.act, add=add)
        return y.reshape(shape)
