"""FID InceptionV3 parity tests vs a plain-torch reference implementation.

torchvision/pytorch-fid are not installed here, so the torch side is built
from torch.nn primitives following pytorch-fid's FIDInception* definitions
(BN eps=1e-3, count_include_pad=False avg pools, max-pool in Mixed_7c).
A random state dict initializes BOTH models; outputs must agree, which
validates the Flax architecture AND the BN-folding converter together.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp

from cfgpp_tpu.metrics.inception import InceptionV3Features, convert_inception


class TBasicConv2d(tnn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(i, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1, count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch3x3(x),
                          self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                          F.max_pool2d(x, 3, 2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1, count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)),
                          self.branch7x7x3_4(self.branch7x7x3_3(
                              self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                          F.max_pool2d(x, 3, 2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, i, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "avg":
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        else:
            bp = F.max_pool2d(x, 3, 1, 1)
        return torch.cat([b1, b3, bd, self.branch_pool(bp)], 1)


class TInception(tnn.Module):
    """Full FID-variant InceptionV3 trunk through pool3."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return x.mean(dim=(2, 3))


def _random_state_dict(model: tnn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            out[k] = v
        elif "running_var" in k:
            out[k] = torch.rand(v.shape, generator=g) + 0.5
        elif k.endswith(("weight", "bias", "running_mean")):
            out[k] = torch.randn(v.shape, generator=g) * 0.05
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def torch_model_and_state():
    model = TInception().eval()
    state = _random_state_dict(model)
    model.load_state_dict(state)
    return model, {k: v.numpy() for k, v in state.items()}


def test_inception_full_parity(torch_model_and_state):
    """Random weights through torch ref vs converted Flax: features match."""
    model, state = torch_model_and_state
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 96, 96, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(np.transpose(2.0 * x - 1.0, (0, 3, 1, 2)))).numpy()

    flax_model = InceptionV3Features(resize_input=False)
    params = convert_inception(state)
    out = np.asarray(flax_model.apply(params, jnp.asarray(x)))
    assert out.shape == (1, 2048)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_inception_resize_matches_torch_interpolate():
    """jax.image.resize (half-pixel, no antialias) == F.interpolate bilinear."""
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    t = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                      size=(299, 299), mode="bilinear", align_corners=False)
    j = jax.image.resize(jnp.asarray(x), (1, 299, 299, 3), method="bilinear",
                         antialias=False)
    np.testing.assert_allclose(np.asarray(j), np.transpose(t.numpy(), (0, 2, 3, 1)),
                               atol=2e-6)


def test_convert_inception_ignores_aux_and_fc(torch_model_and_state):
    _, state = torch_model_and_state
    state = dict(state)
    state["fc.weight"] = np.zeros((1000, 2048), np.float32)
    state["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    state["AuxLogits.conv0.bn.weight"] = np.zeros(128, np.float32)
    state["AuxLogits.conv0.bn.bias"] = np.zeros(128, np.float32)
    state["AuxLogits.conv0.bn.running_mean"] = np.zeros(128, np.float32)
    state["AuxLogits.conv0.bn.running_var"] = np.ones(128, np.float32)
    params = convert_inception(state)
    assert "AuxLogits" not in params["params"]
    assert "fc" not in params["params"]
