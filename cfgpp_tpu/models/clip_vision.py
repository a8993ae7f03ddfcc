"""CLIP vision transformer (image tower) for CLIP-score evaluation.

The reference repo computes FID/LPIPS/PSNR offline (`utils/calculate_metrics.py`)
and the paper's CLIP-score was produced outside the repo (SURVEY.md §3.5);
the TPU build makes CLIP-score first-class.  Weights convert from HF
`CLIPVisionModelWithProjection` via cfgpp_tpu.weights.convert.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from cfgpp_tpu.models.attention import CLIPAttention


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024          # ViT-L/14
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: Optional[int] = 768
    layer_norm_eps: float = 1e-5


class _VisionMLP(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.config.intermediate_size, name="fc1")(x)
        x = x * nn.sigmoid(1.702 * x)  # quick_gelu
        return nn.Dense(self.config.hidden_size, name="fc2")(x)


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ln = functools.partial(nn.LayerNorm, epsilon=cfg.layer_norm_eps)
        x = x + CLIPAttention(cfg.num_heads, cfg.hidden_size,
                              name="self_attn")(ln(name="layer_norm1")(x), mask=None)
        x = x + _VisionMLP(cfg, name="mlp")(ln(name="layer_norm2")(x))
        return x


class CLIPVisionModel(nn.Module):
    """Images [B,H,W,3] in CLIP-normalized space -> projected image embeds."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = pixels.shape[0]
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                          name="patch_embedding")(pixels)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)), patches], axis=1)
        n = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         ((cfg.image_size // cfg.patch_size) ** 2 + 1, cfg.hidden_size))
        x = x + pos[None, :n]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = _VisionLayer(cfg, name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm")(x[:, 0])
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              name="visual_projection")(pooled)
        return pooled


# CLIP preprocessing constants (OpenAI CLIP normalization).
CLIP_IMAGE_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_IMAGE_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def preprocess_for_clip(images01: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] -> resized + CLIP-normalized [B,size,size,3].

    Square inputs only: a batched squash-resize of non-square images would
    distort aspect ratio and silently diverge from the CLIP processor's
    shortest-side-resize + center-crop — crop on the host first
    (metrics/clip_score.py:load224 is the reference implementation).
    """
    import jax
    b, h, w, _ = images01.shape
    if h != w:
        raise ValueError(
            f"preprocess_for_clip needs square images (got {h}x{w}); "
            "resize-shortest-side + center-crop on the host first "
            "(see metrics/clip_score.py:load224)")
    imgs = jax.image.resize(images01, (b, size, size, 3), method="bicubic")
    return (imgs - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
