"""LPIPS (VGG flavour) in Flax.

Perceptual distance used by the reference's metric CLI
(`utils/calculate_metrics.py:144-151`, lpips package, net='vgg').  The VGG16
feature trunk + per-layer 1x1 linear heads are implemented here; weights
convert from a torchvision-format VGG16 state dict plus LPIPS linear-head
tensors via `convert_vgg16_lpips`.  Without weight files the metric is
unavailable (this environment has no downloads) — the CLI reports that
explicitly instead of silently skipping.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (out_channels, n_convs) per stage; taps after each stage.
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# channels of the tapped activations, in order
LPIPS_TAP_CHANNELS = tuple(c for c, _ in _VGG_STAGES)

# ImageNet normalization LPIPS uses (its 'scaling layer').
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the 5 LPIPS tap activations (NHWC)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        for stage, (ch, n) in enumerate(_VGG_STAGES):
            for _ in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
            if stage < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips(img0, img1) for images in [-1, 1], NHWC."""

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        def norm_input(x):
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(name="vgg")
        fa, fb = vgg(norm_input(a)), vgg(norm_input(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            xb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (xa - xb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def convert_vgg16_lpips(vgg_state: Dict[str, np.ndarray],
                        lin_state: Dict[str, np.ndarray]) -> dict:
    """torchvision `vgg16.features` + LPIPS `lin{i}.model.1.weight` tensors
    -> LPIPS flax params."""
    tree: dict = {"vgg": {}, }
    # torchvision features indices of conv layers in sequence
    conv_positions = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, pos in enumerate(conv_positions):
        w = vgg_state[f"features.{pos}.weight"]
        b = vgg_state[f"features.{pos}.bias"]
        tree["vgg"][f"conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}
    for i in range(5):
        w = lin_state[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
        tree[f"lin_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    return {"params": tree}
