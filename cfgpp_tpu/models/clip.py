"""CLIP text encoders (ViT-L/14, ViT-H, OpenCLIP bigG) in Flax.

Replaces the external HF `CLIPTextModel` / `CLIPTextModelWithProjection`
the reference loads (`latent_diffusion.py:65-66,92-115`,
`latent_sdxl.py:46-49,76-128`).  Exposes per-layer hidden states (SDXL taps
``hidden_states[-2]``, the penultimate layer output BEFORE the final
LayerNorm) and the projected pooled embedding (pooled = final-LN hidden at
the first EOS position, matching HF's eos-based pooling).

Runs in fp32 by default: text encoding is a negligible fraction of the
sampling cost (2-4 calls of a 77-token encoder vs 50 UNet calls) and fp32
keeps embedding parity tight.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cfgpp_tpu.configs import CLIPTextConfig
from cfgpp_tpu.models.attention import CLIPAttention


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = quick_gelu if self.config.hidden_act == "quick_gelu" else (
            functools.partial(nn.gelu, approximate=False))
        x = nn.Dense(self.config.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = act(x)
        return nn.Dense(self.config.hidden_size, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        ln = functools.partial(nn.LayerNorm, epsilon=cfg.layer_norm_eps,
                               dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + CLIPAttention(cfg.num_heads, cfg.hidden_size, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="self_attn")(ln(name="layer_norm1")(x), mask)
        x = x + CLIPMLP(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="mlp")(ln(name="layer_norm2")(x))
        return x


@dataclasses.dataclass
class CLIPTextOutput:
    last_hidden_state: jnp.ndarray       # after final LN   [B, 77, H]
    penultimate_hidden_state: jnp.ndarray  # layer N-1 output, NO final LN
    pooled_output: jnp.ndarray           # eos-pooled (projected if configured)


class CLIPTextModel(nn.Module):
    """Returns last hidden state, the penultimate hidden state, and the
    (optionally projected) pooled output — everything SD/SDXL consume."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 clip_skip: Optional[int] = None) -> CLIPTextOutput:
        """``clip_skip`` selects the hidden-state tap the way SDXL does
        (`latent_sdxl.py:88-92`): None -> penultimate layer output
        (HF hidden_states[-2]); k -> hidden_states[-(k+2)]."""
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size), self.param_dtype)
        x = tok + pos[None, :n, :].astype(self.dtype)

        # additive causal mask (CLIP text encoders are causal)
        mask = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)
        mask = mask[None, None, :, :]

        hiddens = [x]   # HF hidden_states: [embeddings, layer1_out, ...]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x, mask)
            hiddens.append(x)
        skip = 0 if clip_skip is None else int(clip_skip)
        penultimate = hiddens[-(skip + 2)]

        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="final_layer_norm")(x)

        # EOS pooling: hidden state at the FIRST eos token per sequence.
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="text_projection")(pooled)
        return CLIPTextOutput(last_hidden_state=last,
                              penultimate_hidden_state=penultimate,
                              pooled_output=pooled)
