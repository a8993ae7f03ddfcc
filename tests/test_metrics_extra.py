"""LPIPS torch-parity + CLIP-score + metrics-CLI wiring tests.

The LPIPS reference side is built from plain torch.nn following the lpips
package's VGG configuration (torchvision vgg16.features layout, scaling
layer, unit-normalized taps, 1x1 linear heads, spatial mean); a random
state dict drives both it and the Flax port through `convert_vgg16_lpips`.
"""

import json
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax.numpy as jnp

from cfgpp_tpu.metrics.clip_score import clip_score_from_features
from cfgpp_tpu.metrics.lpips import LPIPS, convert_vgg16_lpips

_VGG_CONV_POS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_TAP_AFTER = {1, 3, 6, 9, 12}    # conv indices whose relu output is tapped
_POOL_AFTER = {1, 3, 6, 9}       # pools between stages
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_lpips(vgg_state, lin_state, a, b):
    """Reference LPIPS computed with plain torch ops from the state dicts."""
    def feats(x):
        x = (x - _SHIFT) / _SCALE
        taps = []
        cin = 3
        for i, pos in enumerate(_VGG_CONV_POS):
            w = torch.from_numpy(vgg_state[f"features.{pos}.weight"])
            bias = torch.from_numpy(vgg_state[f"features.{pos}.bias"])
            x = F.relu(F.conv2d(x, w, bias, padding=1))
            if i in _TAP_AFTER:
                taps.append(x)
                if i in _POOL_AFTER:
                    x = F.max_pool2d(x, 2, 2)
        return taps

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        xa = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
        xb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
        d = (xa - xb) ** 2
        w = torch.from_numpy(lin_state[f"lin{i}.model.1.weight"])
        total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
    return total


@pytest.fixture(scope="module")
def lpips_states():
    rng = np.random.default_rng(0)
    vgg = {}
    cin = 3
    for pos, cout in zip(_VGG_CONV_POS, _VGG_CHANNELS):
        vgg[f"features.{pos}.weight"] = (
            rng.normal(size=(cout, cin, 3, 3)) * 0.05).astype(np.float32)
        vgg[f"features.{pos}.bias"] = (
            rng.normal(size=cout) * 0.05).astype(np.float32)
        cin = cout
    lin = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        lin[f"lin{i}.model.1.weight"] = np.abs(
            rng.normal(size=(1, c, 1, 1))).astype(np.float32)
    return vgg, lin


def test_lpips_matches_torch_reference(lpips_states):
    vgg_state, lin_state = lpips_states
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)

    ref = _torch_lpips(vgg_state, lin_state,
                       torch.from_numpy(np.transpose(a, (0, 3, 1, 2))),
                       torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))).numpy()

    params = convert_vgg16_lpips(vgg_state, lin_state)
    out = np.asarray(LPIPS().apply(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_lpips_identical_images_zero(lpips_states):
    vgg_state, lin_state = lpips_states
    params = convert_vgg16_lpips(vgg_state, lin_state)
    a = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, size=(1, 32, 32, 3)).astype(np.float32))
    out = np.asarray(LPIPS().apply(params, a, a))
    assert abs(float(out[0])) < 1e-6


def test_clip_score_from_features():
    t = np.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    v = np.asarray([[1.0, 0.0], [1.0, 0.0], [-1.0, 0.0]])
    # cos = 1, 0, -1 -> clipped: 100, 0, 0 -> mean 33.33
    assert abs(clip_score_from_features(t, v) - 100.0 / 3) < 1e-6
    with pytest.raises(ValueError, match="shapes differ"):
        clip_score_from_features(t, v[:2])


def test_metrics_cli_weight_gated(tmp_path):
    """CLI runs end-to-end on tiny images; weight-gated metrics are null."""
    from PIL import Image

    from cfgpp_tpu.cli.calculate_metrics import main

    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        Image.fromarray(img).save(a_dir / f"{i:05d}.png")
        Image.fromarray(img).save(b_dir / f"{i:05d}.png")
    out = tmp_path / "m.json"
    main(["--input_dir", str(a_dir), "--label_dir", str(b_dir),
          "--out", str(out)])
    res = json.loads(out.read_text())
    assert res["n_pairs"] == 3
    assert res["mse"] == 0.0
    assert res["fid"] is None and res["lpips"] is None
    assert res["clip_fid"] is None and res["clip_score"] is None
