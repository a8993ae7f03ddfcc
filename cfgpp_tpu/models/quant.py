"""Int8 W8A8 quantized projection layers (opt-in fast path).

TPU v5e executes int8 MXU matmuls at 394 TOPS — 2x the bf16 peak.
Routing W8A8 through XLA alone loses end-to-end (181.7 ms/step quantized
vs 113.9 bf16 on the SDXL step: the per-token quantize, the dot and the
dequant each materialize as separate f32-heavy HBM passes), so on TPU
`QuantDense` dispatches to the fused Pallas kernel
(`cfgpp_tpu/kernels/int8_matmul.py`) which folds the whole pipeline into
the matmul tiling — measured 312 TF/s on the GEGLU shape vs 175 bf16.
With the dense-only mode (convs stay bf16 — XLA int8 convs measured
slower in-context) the quantized SDXL 25-NFE batch-4 pipeline runs
0.394 img/s vs 0.375 exact bf16.

Recipe (standard robust W8A8):
* weights: symmetric per-output-channel int8, quantized once at load time
  (`cfgpp_tpu.weights.quantize.quantize_unet_params`);
* activations: symmetric per-token dynamic int8, row-wise absmax computed
  on the fly (inside the Pallas kernel on TPU; an XLA pass elsewhere);
* accumulation in int32, dequantized by the rank-1 outer product of the two
  scale vectors, bias added in f32.

This changes numerics relative to the exact bf16 path and is therefore
strictly opt-in (`ModelBundle.quantized()`); the exact path stays the
default everywhere.  The reference has no quantization story at all
(fp16 autocast only, `latent_diffusion.py:254`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.jit
def quantize_kernel_int8(kernel) -> tuple:
    """bf16/f32 [K, N] kernel -> (int8 [K, N], f32 [N] per-column scale).

    Pure jnp so the quantization runs where the params live — pulling the
    2.57B-param SDXL tree to host numpy through the TPU tunnel measured
    ~17 minutes; on device it is seconds."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale.astype(jnp.float32)


def quantize_activation_int8(x: jnp.ndarray):
    """Per-token (row) dynamic symmetric quantization.  [..., K] bf16/f32 ->
    (int8 [..., K], f32 [..., 1] scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
    return xq, sx


@jax.jit
def quantize_conv_kernel_int8(kernel) -> tuple:
    """bf16/f32 [kh, kw, I, O] kernel -> (int8 same shape, f32 [O] scale)."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale.astype(jnp.float32)


class QuantConv(nn.Module):
    """Int8 W8A8 convolution (drop-in for the UNet resnet `nn.Conv`s).

    TPU dispatch:
    * 1x1 stride-1 convs ARE matmuls — routed through the fused Pallas
      `int8_matmul` (per-PIXEL activation scales, exactly valid since a
      1x1 window mixes no spatial positions);
    * 3x3 stride-1 pad-1 convs (every resnet/upsampler conv) go to the
      fused Pallas `int8_conv3x3` (per-(sample,row-window) scales — the
      finest granularity one accumulation window permits);
    * everything else (the two strided downsampler convs, tiny shapes)
      falls back to the XLA recipe below with per-sample scales.

    Weights are per-output-channel int8 everywhere.  The XLA fallback's
    quant/dequant stages each cost a full f32 HBM pass, which is why the
    fused kernels exist (round-2 measurement: XLA-only --quant all ran
    181.7 ms/step vs 113.9 bf16 on the SDXL batch-4 step).
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, gn_scale=None, gn_bias=None,
                 residual=None) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.zeros,
                            (kh, kw, x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if jax.default_backend() == "tpu":
            from cfgpp_tpu.kernels.int8_conv import (int8_conv3x3,
                                                     int8_conv3x3_supported)
            from cfgpp_tpu.kernels.int8_matmul import int8_matmul
            if (kh, kw) == (3, 3) and int8_conv3x3_supported(
                    x.shape, self.strides, self.padding, self.features):
                return int8_conv3x3(x, kernel, scale, bias,
                                    gn_scale=gn_scale, gn_bias=gn_bias,
                                    residual=residual).astype(self.dtype)
            if gn_scale is not None:
                # prologue in XLA only when the fused-kernel route is out
                x = x.astype(jnp.float32) * gn_scale[:, None, None, :] \
                    + gn_bias[:, None, None, :]
                x = nn.silu(x)
            if (kh, kw) == (1, 1) and self.strides in ((1, 1), None):
                y = int8_matmul(x, kernel.reshape(x.shape[-1], self.features),
                                scale, bias, residual=residual)
                return y.astype(self.dtype)
        elif gn_scale is not None:
            x = x.astype(jnp.float32) * gn_scale[:, None, None, :] \
                + gn_bias[:, None, None, :]
            x = nn.silu(x)
        # Fallback: dequantize the weights and run ONE bf16/f32 conv.  NOT
        # the XLA W8A8 recipe — its per-sample absmax, quantize write and
        # int32->f32 dequant each cost a full-activation HBM pass (that
        # chain is why round-2's --quant all lost, 181.7 vs 113.9 ms/step).
        # Weight dequant is [kh,kw,C,O] elementwise — negligible next to
        # the activation traffic the W8A8 chain would have spent.
        wf = (kernel.astype(jnp.float32) * scale).astype(self.dtype)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wf, self.strides, pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias
        if residual is not None:
            y = y + residual.astype(jnp.float32)
        return y.astype(self.dtype)


class QuantParams(nn.Module):
    """Bare int8 param holder (``kernel``/``scale``/optional ``bias``) with
    the exact tree layout of `QuantDense` — used where a fused kernel
    consumes several layers' params in ONE call (the FF block,
    unet.py FeedForward -> kernels/int8_matmul.py:int8_ff_geglu) so no
    per-layer module forward exists.  Declaring params through this module
    keeps checkpoint trees identical across backends and fused/unfused
    paths."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.zeros,
                            (self.in_features, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, scale, bias


class LNParams(nn.Module):
    """LayerNorm param holder (``scale``/``bias``, the `nn.LayerNorm` tree
    layout) for the fused-LN quant path: the norm itself runs inside the
    following int8 matmul kernel, so no module forward exists."""

    dim: int
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.dim,), self.param_dtype)
        return scale, bias


def groupnorm_silu_coeffs(x, gamma, beta, groups: int,
                          temb=None, eps: float = 1e-5):
    """Collapse ``GroupNorm(x + temb) * gamma + beta`` into ONE per-
    (sample, channel) affine ``x * s + b`` (SiLU applied downstream by the
    consumer, e.g. in kernels/int8_conv.py's fused prologue).

    The group statistics of ``x + temb`` (temb per (sample, channel),
    broadcast over space — the resnet time-emb add, unet.py:83) follow
    from per-channel moments of x alone:
      E[(x_c+t_c)]   = E[x_c] + t_c
      E[(x_c+t_c)^2] = E[x_c^2] + 2 t_c E[x_c] + t_c^2
    so the full-tensor add never has to materialize.  Cost: one fused
    reduce pass over x (the stats read XLA would do anyway) + [B, C]
    algebra; the normalize/silu full-tensor write+read disappears into
    the consumer.  Matches flax `nn.GroupNorm` semantics (contiguous
    channel groups, f32 stats, biased variance, eps inside rsqrt).
    """
    xf = x.astype(jnp.float32)
    b, _, _, c = x.shape
    mean_c = jnp.mean(xf, axis=(1, 2))            # [B, C]
    msq_c = jnp.mean(xf * xf, axis=(1, 2))        # [B, C]
    if temb is not None:
        t = temb.astype(jnp.float32)
        msq_c = msq_c + 2.0 * t * mean_c + t * t
        mean_c = mean_c + t
    else:
        t = jnp.zeros((b, c), jnp.float32)
    cg = c // groups
    mean_g = jnp.mean(mean_c.reshape(b, groups, cg), axis=2)
    msq_g = jnp.mean(msq_c.reshape(b, groups, cg), axis=2)
    rstd = jax.lax.rsqrt(msq_g - mean_g * mean_g + eps)        # [B, G]
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    mu_c = jnp.repeat(mean_g, cg, axis=1)
    gam = gamma.astype(jnp.float32)[None]
    s = gam * rstd_c
    bb = (t - mu_c) * rstd_c * gam + beta.astype(jnp.float32)[None]
    return s, bb


def layernorm_ref(x, scale, bias, eps: float = 1e-5):
    """Token LayerNorm matching the in-kernel fused version (f32 stats,
    biased variance) — the non-TPU fallback."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    # stays f32: the consumer is the activation quantizer, which computes
    # in f32 anyway — matching the in-kernel fused LN exactly
    return xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def quant_dense_apply(x, kernel, scale, bias, out_dtype):
    """XLA W8A8 dense (the non-TPU fallback recipe shared by the quant
    modules): per-token dynamic activation quantization, int32 dot,
    rank-1 dequant, f32 bias."""
    xq, sx = quantize_activation_int8(x)
    acc = jax.lax.dot_general(
        xq, kernel, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in int8 replacement for `nn.Dense` (no-bias or bias).

    Params: ``kernel`` int8 [K, N], ``scale`` f32 [N], optional ``bias``.
    Produced from a bf16 Dense by `quantize_unet_params`; the module itself
    never trains or quantizes weights.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.zeros,
                            (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if jax.default_backend() == "tpu":
            # fused Pallas path: quantize -> int8 MXU dot -> dequant in one
            # kernel, no extra HBM passes (302 TF/s on the GEGLU shape vs
            # 175 for the bf16 dot; the equivalent XLA chain below loses
            # end-to-end because each stage is its own f32-heavy fusion)
            from cfgpp_tpu.kernels.int8_matmul import int8_matmul
            return int8_matmul(x, kernel, scale, bias).astype(self.dtype)
        xq, sx = quantize_activation_int8(x)
        acc = jax.lax.dot_general(
            xq, kernel, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * scale
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
