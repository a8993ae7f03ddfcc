"""FID InceptionV3 (pool3, 2048-d features) in Flax.

The standard FID metric (reference: `utils/calculate_metrics.py:167-182`,
which shells out to `pytorch_fid.calculate_fid_given_paths`) is defined
against a specific InceptionV3 port of the 2015-12-05 TF graph.  This module
implements that FID variant exactly:

* InceptionA/C and Mixed_7b pool branches use 3x3 s1 average pooling with
  ``count_include_pad=False`` (pytorch-fid's FIDInceptionA/C/E_1 overrides);
* Mixed_7c (FIDInceptionE_2) uses a 3x3 s1 **max** pool branch;
* inputs are bilinearly resized to 299x299 (half-pixel centers, no
  antialias — matching ``F.interpolate(..., mode='bilinear')``) and mapped
  to [-1, 1].

BatchNorm (eps=1e-3) is folded into the conv weights at conversion time
(`convert_inception` below), so inference is pure conv+relu.  Weights load
from a pytorch-fid / torchvision-layout state dict
(``Mixed_5b.branch1x1.conv.weight`` etc., e.g. the published
``pt_inception-2015-12-05-6726825d.pth``).
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_3x3_no_pad_count(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME avg-pool with count_include_pad=False."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                       count_include_pad=False)


class BasicConv2d(nn.Module):
    """conv (BN pre-folded) + relu."""
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: object = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=True, name="conv")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))   # 1x7
        p71 = ((3, 3), (0, 0))   # 7x1
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # Mixed_7b uses avg-pool (count_include_pad=False), Mixed_7c max-pool
    # (pytorch-fid FIDInceptionE_1 vs FIDInceptionE_2).
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_3x3_no_pad_count(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[N, H, W, 3] in [0, 1] -> [N, 2048] pool3 features (FID standard)."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            n, _, _, c = x.shape
            x = jax.image.resize(x, (n, 299, 299, c), method="bilinear",
                                 antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))   # adaptive avg pool -> 2048


def fold_batchnorm(conv_w: np.ndarray, bn_gamma, bn_beta, bn_mean, bn_var,
                   eps: float = 1e-3):
    """torch conv weight [O,I,kh,kw] + BN stats -> HWIO kernel + bias."""
    w = np.asarray(conv_w, np.float32)
    inv = np.asarray(bn_gamma, np.float32) / np.sqrt(
        np.asarray(bn_var, np.float32) + eps)
    w = w * inv[:, None, None, None]
    bias = np.asarray(bn_beta, np.float32) - np.asarray(bn_mean, np.float32) * inv
    return np.transpose(w, (2, 3, 1, 0)), bias


def convert_inception(state: Mapping[str, np.ndarray]) -> Dict:
    """pytorch-fid / torchvision inception state dict -> Flax params.

    Expects keys ``<block>.<branch>.conv.weight`` + ``<block>.<branch>.bn.*``
    (aux-classifier and fc keys are ignored).
    """
    tree: Dict = {}
    prefixes = sorted({k.rsplit(".conv.weight", 1)[0]
                       for k in state if k.endswith(".conv.weight")})
    for pre in prefixes:
        if pre.startswith(("AuxLogits", "fc")):
            continue
        kernel, bias = fold_batchnorm(
            state[f"{pre}.conv.weight"],
            state[f"{pre}.bn.weight"], state[f"{pre}.bn.bias"],
            state[f"{pre}.bn.running_mean"], state[f"{pre}.bn.running_var"])
        node = tree
        parts = pre.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"conv": {"kernel": kernel, "bias": bias}}
    return {"params": tree}


@functools.lru_cache(maxsize=2)
def _cached_extractor(ckpt_path: str):
    """Load + convert + jit once per checkpoint path: a FID run calls the
    extractor for BOTH directories and would otherwise pay two weight
    loads and two XLA compiles of the Inception tower."""
    state = _load_state_dict(ckpt_path)
    model = InceptionV3Features()
    params = convert_inception(state)
    return jax.jit(lambda px: model.apply(params, px))


def inception_features(paths, ckpt_path: str, batch: int = 50) -> np.ndarray:
    """Image files -> [N, 2048] FID features (weights from a .pth/.safetensors
    pytorch-fid state dict).

    Uniform-size directories go through the model's own bilinear resize
    (bit-parity with pytorch-fid's F.interpolate, see
    test_inception_resize_matches_torch_interpolate).  Heterogeneous
    directories (e.g. raw MS-COCO references — which crash pytorch-fid's
    own batched loader) are host-resized per image to 299 with PIL
    bilinear first; the kernel difference is logged since resize choice
    can shift FID slightly."""
    if not paths:
        raise ValueError("inception_features: no images given (empty or "
                         "unmatched directory?)")
    apply = _cached_extractor(str(ckpt_path))

    from PIL import Image
    sizes = set()
    for p in paths:
        with Image.open(p) as im:
            sizes.add(im.size)
        if len(sizes) > 1:
            break
    uniform = len(sizes) <= 1
    if not uniform:
        import logging
        logging.getLogger("cfgpp_tpu.metrics").warning(
            "mixed image sizes in FID input: host PIL-bilinear resize to "
            "299 replaces the in-model tensor resize for this directory "
            "(pytorch-fid's own loader cannot batch mixed sizes)")

    def load(p):
        im = Image.open(p).convert("RGB")
        if not uniform and im.size != (299, 299):
            im = im.resize((299, 299), Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0

    feats = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([load(p) for p in paths[i:i + batch]])
        feats.append(np.asarray(apply(jnp.asarray(imgs))))
    return np.concatenate(feats)


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}
