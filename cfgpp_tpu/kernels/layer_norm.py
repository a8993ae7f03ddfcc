"""Pallas TPU LayerNorm kernels: stats-only and fused residual-add+stats.

Library primitives; the UNet deliberately does NOT use them.  The SDXL
UNet runs 210 LayerNorms per denoising step (70 transformer layers x 3)
inside XLA convert_reduce fusions (23.7 ms at ~305 GB/s effective), which
looked like the top bandwidth target.  Three integration variants were
built and measured on v5e (SDXL 1024^2 step, baseline 114 ms of device
ops):

* stats-only hybrid (`layer_norm_stats` + jnp normalize): 129 ms — the
  residual adds, previously fused into XLA's LN reads, materialized as a
  new 18 ms standalone-add bucket (elementwise producers cannot fuse into
  an opaque custom call).
* residual-fused (`residual_layer_norm_stats`: z = x+y and stats in one
  pass, deferred-add transformer restructure): 130 ms — the adds fused
  (kernel time: 1.0 ms total for 199 calls), but XLA's global layout
  assignment responded by splitting/re-laying the *convolutions*
  (conv bucket 21.6 -> 33.3 ms, op count 98 -> 250) and left the
  GroupNorm statistics in a 63 GB/s form.
* (GroupNorm variants: see kernels/group_norm.py — same story.)

Conclusion recorded here so it is not re-learned: this XLA version's
layout assignment around interleaved custom calls in the UNet body is
chaotic, and the XLA-only graph is a strong local optimum.  The kernels
remain available (and tested — tests/test_layer_norm.py) for graphs
without that sensitivity.

Statistics match Flax `nn.LayerNorm` (fp32 E[x^2]-E[x]^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfgpp_tpu.kernels.common import pick_row_block as _pick_rows


def _ln_stats_kernel(x_ref, o_ref, *, eps: float):
    xf = x_ref[0].astype(jnp.float32)                    # [bn, C]
    c = jnp.float32(xf.shape[-1])
    mean = jnp.sum(xf, axis=1, keepdims=True) / c        # [bn, 1]
    msq = jnp.sum(xf * xf, axis=1, keepdims=True) / c
    var = jnp.maximum(msq - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    o_ref[0] = jnp.concatenate([mean, rstd], axis=1)     # [bn, 2]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def layer_norm_stats(x: jnp.ndarray, eps: float = 1e-5,
                     interpret: bool = False) -> jnp.ndarray:
    """[B, N, C] -> f32 [B, N, 2] per-row (mean, rstd), one streaming read."""
    b, n, c = x.shape
    bn = _pick_rows(n, c, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_ln_stats_kernel, eps=eps),
        grid=(b, n // bn),
        in_specs=[pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, bn, 2), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x)


def _res_ln_stats_kernel(x_ref, y_ref, z_ref, o_ref, *, eps: float):
    zf = x_ref[0].astype(jnp.float32) + y_ref[0].astype(jnp.float32)
    z_ref[0] = zf.astype(z_ref.dtype)
    c = jnp.float32(zf.shape[-1])
    mean = jnp.sum(zf, axis=1, keepdims=True) / c
    msq = jnp.sum(zf * zf, axis=1, keepdims=True) / c
    var = jnp.maximum(msq - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    o_ref[0] = jnp.concatenate([mean, rstd], axis=1)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def residual_layer_norm_stats(x: jnp.ndarray, y: jnp.ndarray,
                              eps: float = 1e-5,
                              interpret: bool = False):
    """Fused transformer residual add + LayerNorm statistics.

    ``z = x + y`` is written once and its per-row f32 (mean, rstd) come out
    of the same streaming pass — an elementwise add can never fuse into an
    opaque custom call, so without this the three residual adds per
    transformer layer materialize as standalone passes (measured +18
    ms/step).  Returns (z, stats[B, N, 2])."""
    b, n, c = x.shape
    bn = _pick_rows(n, c, x.dtype.itemsize)
    x_spec = pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0))
    return pl.pallas_call(
        functools.partial(_res_ln_stats_kernel, eps=eps),
        grid=(b, n // bn),
        in_specs=[x_spec, x_spec],
        out_specs=(x_spec, pl.BlockSpec((1, bn, 2), lambda i, j: (i, j, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, n, c), x.dtype),
                   jax.ShapeDtypeStruct((b, n, 2), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x, y)


def apply_norm_stats(z: jnp.ndarray, stats: jnp.ndarray, gamma: jnp.ndarray,
                     beta: jnp.ndarray) -> jnp.ndarray:
    """jnp normalize from precomputed (mean, rstd) — fuses into consumers."""
    mean = stats[..., 0:1]
    rstd = stats[..., 1:2]
    y = (z.astype(jnp.float32) - mean) * rstd
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(z.dtype)


def layer_norm_hybrid(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                      eps: float = 1e-5,
                      interpret: bool = False) -> jnp.ndarray:
    """Pallas statistics + jnp normalize (fuses into the consumer dots)."""
    stats = layer_norm_stats(x, eps, interpret=interpret)
    mean = stats[..., 0:1]
    rstd = stats[..., 1:2]
    y = (x.astype(jnp.float32) - mean) * rstd
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_xla(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   eps: float = 1e-5) -> jnp.ndarray:
    """Reference path (any backend): fp32 stats, same formula."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm on [B, N, C]; Pallas-stats hybrid on TPU, XLA elsewhere."""
    b, n, c = x.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or n % 8 or n < 8:
        return layer_norm_xla(x, gamma, beta, eps)
    return layer_norm_hybrid(x, gamma, beta, eps)
