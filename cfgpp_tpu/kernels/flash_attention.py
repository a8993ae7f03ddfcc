"""Pallas TPU flash attention (non-causal, no mask).

Blockwise softmax-attention with O(N) memory: the only custom-kernel surface
this workload needs (SURVEY.md §2.4).  Replaces PyTorch SDPA /
AttnProcessor2_0 inside the reference's diffusers UNet (`latent_sdxl.py:7-10`).

Targets UNet self-attention: SDXL at 1024^2 runs 4096- and 1024-token
sequences with head_dim 64 — MXU-friendly tiles.  Cross-attention (kv=77)
and SD-1.5's odd head dims (40/80/160) stay on the XLA einsum path, chosen
by `cfgpp_tpu.models.attention.sdpa`; measure, don't assume (SURVEY.md §7).

Layout: q,k,v [B, N, H, D] -> kernel runs on [B*H, N, D] with a
(batch*heads, q_blocks, kv_blocks) grid; kv is the innermost (sequential)
dimension so the running max/sum/acc scratch carries across kv steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured on TPU v5e (D=64): 1024/1024 blocks + exp2 softmax reach ~77 TF/s
# at N=4096 (vs ~44 at 512/512 with exp) and ~172 TF/s at N=1024
# (single-block); 2048/2048 exceeds the 16MB scoped-vmem limit.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024
NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch, *, scale):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]                       # [bq, d]
    k = k_ref[0]                       # [bkv, d]
    v = v_ref[0]

    # Work in log2 space: exp2 is markedly cheaper than exp on the VPU
    # (~1.7x whole-kernel speedup at N=1024); fold log2(e) into the scale.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)                # [bq, bkv] f32, log2-scaled

    m_prev = m_scratch[:]              # [bq, 128] (broadcast lanes)
    m_cur = jnp.max(s, axis=1, keepdims=True)          # [bq, 1]
    m_next = jnp.maximum(m_prev, m_cur)                # [bq, 128]

    p = jnp.exp2(s - m_next[:, :1])                    # [bq, bkv]
    alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])    # [bq, 1]

    l_scratch[:] = l_scratch[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scratch[:] = m_next

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[:] = acc_scratch[:] * alpha + pv

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / l_scratch[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    interpret: bool = False,
) -> jnp.ndarray:
    """q,k,v: [B, N, H, D] -> [B, N, H, D].  Non-causal, unmasked."""
    b, n_q, h, d = q.shape
    n_kv = k.shape[1]
    scale = d ** -0.5

    block_q = min(block_q, n_q)
    block_kv = min(block_kv, n_kv)
    if n_q % block_q or n_kv % block_kv:
        raise ValueError(f"seq lens ({n_q},{n_kv}) must tile by ({block_q},{block_kv})")

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)

    grid = (b * h, n_q // block_q, n_kv // block_kv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bh, iq, ik: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max (lane-padded)
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),     # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qh, kh, vh)

    return out.reshape(b, h, n_q, d).transpose(0, 2, 1, 3)
