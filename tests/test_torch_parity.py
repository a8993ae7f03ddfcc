"""Independent-torch numerical parity for the UNet and VAE towers.

The two largest models in the repo were previously validated only by param
counts and converter round-trips, which cannot catch a wrong attention
scale, GroupNorm grouping order, GEGLU split order or sinusoid convention.
Here a plain-torch reference (tests/torch_ref_models.py, written from the
diffusers architecture definitions) and the Flax modules are driven from
ONE random state dict through the real converters
(`cfgpp_tpu.weights.convert`); outputs must agree in fp32.

Covers reference call sites `/root/reference/latent_diffusion.py:67,117-129`
(SD-1.5 UNet + VAE) and `/root/reference/latent_sdxl.py:50` (SDXL UNet with
the text_time added-condition path), at tiny config size in both projection
variants (conv-projection tiny_sd, linear-projection tiny_sdxl).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cfgpp_tpu.configs import tiny_sd_config, tiny_sdxl_config
from cfgpp_tpu.models import AutoencoderKL, UNet2DConditionModel
from cfgpp_tpu.weights.convert import convert_unet, convert_vae

from tests.torch_ref_models import TAutoencoderKL, TUNet


def _randomize(module: torch.nn.Module, seed: int) -> dict:
    """Fill EVERY param (incl. norm scales/biases, which torch inits to
    1/0 and would otherwise mask scale-vs-shift mix-ups) with random values
    small enough to keep the tiny nets numerically tame."""
    gen = torch.Generator().manual_seed(seed)
    state = module.state_dict()
    new = {}
    for k, v in state.items():
        r = torch.randn(v.shape, generator=gen, dtype=torch.float32) * 0.15
        if k.endswith(".weight") and r.ndim == 1:   # norm scales near 1
            r = r + 1.0
        new[k] = r
    module.load_state_dict(new)
    module.eval()
    return {k: v.numpy() for k, v in new.items()}


def _max_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


@pytest.mark.parametrize("name", ["tiny_sd", "tiny_sdxl"])
def test_unet_forward_parity(name):
    cfg = (tiny_sd_config() if name == "tiny_sd" else tiny_sdxl_config()).unet
    tmodel = TUNet(cfg)
    state = _randomize(tmodel, seed=0)

    params = convert_unet(state)
    fmodel = UNet2DConditionModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    rng = np.random.default_rng(1)
    b, s = 2, 16
    sample = rng.standard_normal((b, s, s, cfg.in_channels), np.float32)
    t = np.asarray([7, 421], np.int32)
    ctx = rng.standard_normal((b, 77, cfg.cross_attention_dim), np.float32)

    targs = [torch.from_numpy(np.transpose(sample, (0, 3, 1, 2))),
             torch.from_numpy(t.astype(np.float32)), torch.from_numpy(ctx)]
    fargs = [jnp.asarray(sample), jnp.asarray(t), jnp.asarray(ctx)]
    if cfg.addition_embed_type == "text_time":
        pooled_dim = cfg.projection_class_embeddings_input_dim \
            - 6 * cfg.addition_time_embed_dim
        pooled = rng.standard_normal((b, pooled_dim), np.float32)
        time_ids = np.tile(np.asarray([[s * 8, s * 8, 0, 0, s * 8, s * 8]],
                                      np.float32), (b, 1))
        targs += [torch.from_numpy(pooled), torch.from_numpy(time_ids)]
        fargs += [jnp.asarray(pooled), jnp.asarray(time_ids)]

    with torch.no_grad():
        t_out = tmodel(*targs).numpy()
    f_out = np.transpose(np.asarray(fmodel.apply(params, *fargs)), (0, 3, 1, 2))

    assert t_out.shape == f_out.shape
    err = _max_err(t_out, f_out)
    scale = float(np.max(np.abs(t_out))) + 1e-12
    assert err < 2e-4 * max(1.0, scale), f"UNet {name} parity: max err {err}"


def test_vae_encode_decode_parity():
    cfg = tiny_sd_config().vae
    tmodel = TAutoencoderKL(cfg)
    state = _randomize(tmodel, seed=2)

    params = convert_vae(state)
    fmodel = AutoencoderKL(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 32, 32, cfg.in_channels), np.float32)
    with torch.no_grad():
        t_mean, t_logvar = tmodel.encode_moments(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    f_mean, f_logvar = fmodel.apply(params, jnp.asarray(img),
                                    method=fmodel.encode)
    for tt, ff, what in [(t_mean, f_mean, "mean"), (t_logvar, f_logvar, "logvar")]:
        ff = np.transpose(np.asarray(ff), (0, 3, 1, 2))
        assert tt.shape == ff.shape
        err = _max_err(tt.numpy(), ff)
        assert err < 2e-4, f"VAE encode {what} parity: max err {err}"

    # odd input size exercises the encoder's asymmetric (0,1) downsample pad
    img_odd = rng.standard_normal((1, 34, 34, cfg.in_channels), np.float32)
    with torch.no_grad():
        t_m2, _ = tmodel.encode_moments(
            torch.from_numpy(np.transpose(img_odd, (0, 3, 1, 2))))
    f_m2, _ = fmodel.apply(params, jnp.asarray(img_odd), method=fmodel.encode)
    assert t_m2.shape == np.transpose(np.asarray(f_m2), (0, 3, 1, 2)).shape
    assert _max_err(t_m2.numpy(), np.transpose(np.asarray(f_m2), (0, 3, 1, 2))) < 2e-4

    z = rng.standard_normal(np.asarray(f_mean).shape, np.float32) * 0.5
    with torch.no_grad():
        t_img = tmodel.decode(torch.from_numpy(np.transpose(z, (0, 3, 1, 2)))).numpy()
    f_img = np.transpose(
        np.asarray(fmodel.apply(params, jnp.asarray(z), method=fmodel.decode)),
        (0, 3, 1, 2))
    err = _max_err(t_img, f_img)
    scale = float(np.max(np.abs(t_img))) + 1e-12
    assert err < 2e-4 * max(1.0, scale), f"VAE decode parity: max err {err}"


def test_unet_parity_detects_wrong_attention_scale():
    """The harness itself must be discriminating: a deliberately wrong
    attention scale (1/d instead of 1/sqrt(d)) must break parity."""
    cfg = tiny_sd_config().unet
    tmodel = TUNet(cfg)
    state = _randomize(tmodel, seed=4)
    params = convert_unet(state)
    fmodel = UNet2DConditionModel(cfg, dtype=jnp.float32, param_dtype=jnp.float32)

    rng = np.random.default_rng(5)
    sample = rng.standard_normal((1, 16, 16, cfg.in_channels), np.float32)
    ctx = rng.standard_normal((1, 77, cfg.cross_attention_dim), np.float32)
    t = np.asarray([100], np.int32)

    import math
    import unittest.mock as mock
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(np.transpose(sample, (0, 3, 1, 2))),
                       torch.from_numpy(t.astype(np.float32)),
                       torch.from_numpy(ctx)).numpy()
    with mock.patch("math.sqrt", side_effect=lambda d: float(d)):
        with torch.no_grad():
            t_bad = tmodel(torch.from_numpy(np.transpose(sample, (0, 3, 1, 2))),
                           torch.from_numpy(t.astype(np.float32)),
                           torch.from_numpy(ctx)).numpy()
    f_out = np.transpose(
        np.asarray(fmodel.apply(params, jnp.asarray(sample), jnp.asarray(t),
                                jnp.asarray(ctx))), (0, 3, 1, 2))
    assert _max_err(t_out, f_out) < 2e-4
    assert _max_err(t_bad, f_out) > 1e-3  # planted defect must be caught
