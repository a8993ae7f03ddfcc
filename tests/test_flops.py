"""FLOP-accounting sanity tests (utils/flops.py)."""

from cfgpp_tpu.configs import get_bundle_config
from cfgpp_tpu.utils.flops import (pipeline_flops, unet_step_flops,
                                   vae_decode_flops)


def test_sdxl_step_flops_magnitude():
    cfg = get_bundle_config("sdxl")
    f = unet_step_flops(cfg.unet, batch=2, latent_hw=128)
    # hand-derived budget: conv 3.25 + matmul 8.71 + attn 1.57 ~= 13.5 TF
    assert 3.0e12 < f["conv"] < 3.5e12
    assert 8.3e12 < f["matmul"] < 9.1e12
    assert 1.4e12 < f["attn"] < 1.8e12
    assert abs(f["total"] - (f["conv"] + f["matmul"] + f["attn"])) < 1e6


def test_sd15_step_flops_smaller():
    sdxl = get_bundle_config("sdxl")
    sd = get_bundle_config("sd15")
    f_sd = unet_step_flops(sd.unet, batch=2, latent_hw=64)
    f_xl = unet_step_flops(sdxl.unet, batch=2, latent_hw=128)
    assert f_sd["total"] < f_xl["total"] / 5  # ~0.7 vs 13.5 TF


def test_vae_decode_flops_magnitude():
    cfg = get_bundle_config("sdxl")
    f = vae_decode_flops(cfg.vae, latent_hw=128)
    assert 8e12 < f < 13e12  # ~10.8 TF at 1024^2


def test_pipeline_flops_composition():
    cfg = get_bundle_config("sdxl")
    p = pipeline_flops(cfg, resolution=1024, n_model_steps=24)
    assert p["total"] == p["unet_step"]["total"] * 24 + p["vae_decode"]


def test_flops_scale_with_batch_and_res():
    cfg = get_bundle_config("sdxl")
    f1 = unet_step_flops(cfg.unet, batch=2, latent_hw=128)
    f2 = unet_step_flops(cfg.unet, batch=4, latent_hw=128)
    assert abs(f2["total"] / f1["total"] - 2.0) < 0.01
