"""Attention primitives shared by UNet / CLIP / VAE.

The scaled-dot-product core is a single dispatch point: plain XLA einsum
(which XLA fuses well for short-kv cross-attention, kv=77) or the Pallas
TPU flash-attention kernel for long self-attention sequences (up to 16,384
image tokens at SDXL's top block).  Replaces the reference's reliance on
PyTorch SDPA / AttnProcessor2_0 (`latent_sdxl.py:7-10`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Minimum q length for the Pallas flash kernel: below this the einsum path's
# score matrix is small enough that XLA's fusions are competitive and the
# kernel's fixed cost dominates.
FLASH_MIN_Q_LEN = 1024


def _int8_score_enabled() -> bool:
    """Kill-switch for the int8-score attention variant (set
    CFGPP_NO_INT8_SCORE=1 to fall back to bf16 flash in quant mode)."""
    import os
    return os.environ.get("CFGPP_NO_INT8_SCORE") != "1"


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference-quality attention: fp32 softmax, inputs [B, N, H, D]."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _use_flash(q_len: int, kv_len: int, head_dim: int) -> bool:
    """Measured on v5e: flash wins for q_len >= 1024 at every head dim in
    the model zoo (40/64/80/160 UNet heads, 512 single-head VAE), for both
    long-kv self-attention and kv=77 cross-attention (the kernel masks
    padded kv lanes).  Short sequences stay on the fusable einsum path."""
    if jax.default_backend() != "tpu":
        return False
    if q_len < FLASH_MIN_Q_LEN:
        return False
    return head_dim % 8 == 0


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None,
         force_impl: Optional[str] = None) -> jnp.ndarray:
    """Dispatching scaled dot-product attention. Inputs [B, N, H, D]."""
    impl = force_impl
    if impl is None:
        impl = "flash" if (mask is None and _use_flash(q.shape[1], k.shape[1], q.shape[-1])) else "xla"
    if impl == "flash":
        from cfgpp_tpu.kernels.flash_attention import flash_attention
        return flash_attention(q, k, v)
    return sdpa_xla(q, k, v, mask)


def attention_hd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 num_heads: int,
                 mask: Optional[jnp.ndarray] = None,
                 kv_len: Optional[int] = None,
                 int8_score: bool = False,
                 force_impl: Optional[str] = None) -> jnp.ndarray:
    """Attention on token-major [B, N, H*D] activations (projection layout).

    The flash path consumes this layout natively — no [B,N,H,D] head split,
    no N<->H transposes (which cost 4 HBM round-trips per site on the old
    kernel path).  The einsum fallback reshapes (free) and head-splits.

    ``kv_len``: true valid kv rows when k/v come from a lane-tile-padded
    context (unet.py pads the 77-token cross-attn context once per
    forward); the flash kernel masks the tail, the einsum path slices it.
    """
    d = q.shape[-1] // num_heads
    impl = force_impl
    if impl is None:
        impl = "flash" if (mask is None and _use_flash(q.shape[1], k.shape[1], d)) else "xla"
    if impl == "flash":
        from cfgpp_tpu.kernels.flash_attention import (flash_attention_hd,
                                                       flash_attention_hd_int8)
        if int8_score and _int8_score_enabled():
            return flash_attention_hd_int8(q, k, v, num_heads, kv_len=kv_len)
        return flash_attention_hd(q, k, v, num_heads, kv_len=kv_len)
    if kv_len is not None and kv_len != k.shape[1]:
        k, v = k[:, :kv_len], v[:, :kv_len]
    b, n, hd = q.shape
    m = k.shape[1]
    out = sdpa_xla(q.reshape(b, n, num_heads, d), k.reshape(b, m, num_heads, d),
                   v.reshape(b, m, num_heads, d), mask)
    return out.reshape(b, n, hd)


def attention_qkv_packed(qkv: jnp.ndarray, num_heads: int,
                         mask: Optional[jnp.ndarray] = None,
                         int8_score: bool = False,
                         force_impl: Optional[str] = None) -> jnp.ndarray:
    """Self-attention on a packed [B, N, 3*H*D] qkv projection.

    The flash kernel reads q/k/v as channel-offset views of the packed
    array (no slicing copies); the einsum fallback slices — fine at the
    short sequence lengths that route there."""
    hd = qkv.shape[-1] // 3
    d = hd // num_heads
    impl = force_impl
    if impl is None:
        impl = "flash" if (mask is None and _use_flash(qkv.shape[1], qkv.shape[1], d)) else "xla"
    if impl == "flash":
        from cfgpp_tpu.kernels.flash_attention import (
            flash_attention_qkv_packed, flash_attention_qkv_packed_int8)
        if int8_score and _int8_score_enabled():
            return flash_attention_qkv_packed_int8(qkv, num_heads)
        return flash_attention_qkv_packed(qkv, num_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    b, n, _ = qkv.shape
    out = sdpa_xla(q.reshape(b, n, num_heads, d), k.reshape(b, n, num_heads, d),
                   v.reshape(b, n, num_heads, d), mask)
    return out.reshape(b, n, hd)


class Attention(nn.Module):
    """Multi-head attention matching diffusers' `Attention` layout.

    Self-attention when ``context`` is None; cross-attention otherwise.
    q/k/v projections have no bias; the output projection does.
    ``quant=True`` swaps the projections for int8 W8A8 kernels
    (opt-in fast path, see models/quant.py): the self-attention q/k/v
    projections fuse into ONE packed ``to_qkv`` matmul — one activation
    quantize pass instead of three, and a 3x-wider (more MXU-efficient)
    int8 matmul (`weights/quantize.py` packs the params to match) — and
    the transformer block's pre-LayerNorm (``ln``) plus post-attention
    residual add (``residual``) ride inside the matmul kernels instead of
    separate XLA elementwise passes (kernels/int8_matmul.py).
    """

    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 kv_len: Optional[int] = None,
                 ln: Optional[tuple] = None,
                 residual: Optional[jnp.ndarray] = None,
                 cached_kv: Optional[tuple] = None) -> jnp.ndarray:
        """``cached_kv``: precomputed (k, v) for cross-attention.  The kv
        projections depend only on the text context, which is CONSTANT
        across the sampling scan — the engine hoists them out of the
        per-step loop (engine/pipeline.py:precompute_cross_kv) so ~140
        context matmuls/step disappear from the scan body.  The to_k/to_v
        params still exist in the tree (declared at init, when cached_kv
        is None); Flax apply simply leaves them unread."""
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        if self.quant:
            return self._quant_forward(x, ctx, context is None, mask, kv_len,
                                       ln, residual, cached_kv)
        if ln is not None or residual is not None:
            raise ValueError("ln=/residual= fusion is quant-path only")
        dense = functools.partial(nn.Dense, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        q = dense(inner, use_bias=False, name="to_q")(x)
        if cached_kv is not None:
            k, v = cached_kv
        else:
            k = dense(inner, use_bias=False, name="to_k")(ctx)
            v = dense(inner, use_bias=False, name="to_v")(ctx)

        # token-major all the way: the flash kernel blocks heads on the
        # channel dim, so no [B,N,H,D] split / transpose is materialized
        out = attention_hd(q, k, v, self.num_heads, mask=mask, kv_len=kv_len)
        return dense(self.out_dim, use_bias=True, name="to_out")(out)

    def _quant_forward(self, x, ctx, is_self, mask, kv_len, ln, residual,
                      cached_kv=None):
        import jax

        from cfgpp_tpu.models.quant import (QuantParams, layernorm_ref,
                                            quant_dense_apply)
        inner = self.num_heads * self.head_dim
        dim = x.shape[-1]
        on_tpu = jax.default_backend() == "tpu"
        ln_s, ln_b = ln if ln is not None else (None, None)
        if is_self:
            wq, sq, _ = QuantParams(dim, 3 * inner, use_bias=False,
                                    name="to_qkv")()
            if on_tpu:
                from cfgpp_tpu.kernels.int8_matmul import int8_matmul
                qkv = int8_matmul(x, wq, sq, ln_scale=ln_s, ln_bias=ln_b
                                  ).astype(self.dtype)
            else:
                h = x if ln is None else layernorm_ref(x, ln_s, ln_b)
                qkv = quant_dense_apply(h, wq, sq, None, self.dtype)
            # int8-score attention: the logits dot rides the int8 MXU too
            # (< 1% relative error, kernels/flash_attention.py); opt-in
            # with the full-coverage quant mode
            out = attention_qkv_packed(qkv, self.num_heads, mask=mask,
                                       int8_score=self.quant in (True, "all"))
        else:
            wq, sq, _ = QuantParams(dim, inner, use_bias=False, name="to_q")()
            if on_tpu:
                from cfgpp_tpu.kernels.int8_matmul import int8_matmul
                q = int8_matmul(x, wq, sq, ln_scale=ln_s, ln_bias=ln_b
                                ).astype(self.dtype)
            else:
                h = x if ln is None else layernorm_ref(x, ln_s, ln_b)
                q = quant_dense_apply(h, wq, sq, None, self.dtype)
            if cached_kv is not None:
                k, v = cached_kv
            else:
                wk, sk, _ = QuantParams(ctx.shape[-1], inner, use_bias=False,
                                        name="to_k")()
                wv, sv, _ = QuantParams(ctx.shape[-1], inner, use_bias=False,
                                        name="to_v")()
                if on_tpu:
                    from cfgpp_tpu.kernels.int8_matmul import int8_matmul
                    k = int8_matmul(ctx, wk, sk).astype(self.dtype)
                    v = int8_matmul(ctx, wv, sv).astype(self.dtype)
                else:
                    k = quant_dense_apply(ctx, wk, sk, None, self.dtype)
                    v = quant_dense_apply(ctx, wv, sv, None, self.dtype)
            # int8_score deliberately OFF for cross-attention: at kv=77 the
            # score dot is tiny while the per-(token,head) q quantize would
            # cost an extra full HBM round-trip over the long q sequence
            out = attention_hd(q, k, v, self.num_heads, mask=mask,
                               kv_len=kv_len)
        wo, so, bo = QuantParams(inner, self.out_dim, name="to_out")()
        if on_tpu:
            from cfgpp_tpu.kernels.int8_matmul import int8_matmul
            return int8_matmul(out, wo, so, bo, residual=residual
                               ).astype(self.dtype)
        y = quant_dense_apply(out, wo, so, bo, self.dtype)
        return y if residual is None else (y + residual).astype(self.dtype)


class CLIPAttention(nn.Module):
    """CLIP-style MHA: biases on q/k/v/out, additive causal mask."""

    num_heads: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.hidden_size // self.num_heads
        dense = functools.partial(nn.Dense, self.hidden_size, use_bias=True,
                                  dtype=self.dtype, param_dtype=self.param_dtype)
        b, n, _ = x.shape
        q = dense(name="q_proj")(x).reshape(b, n, self.num_heads, head_dim)
        k = dense(name="k_proj")(x).reshape(b, n, self.num_heads, head_dim)
        v = dense(name="v_proj")(x).reshape(b, n, self.num_heads, head_dim)
        out = sdpa_xla(q, k, v, mask=mask)
        return dense(name="out_proj")(out.reshape(b, n, self.hidden_size))
