"""Metrics tests: paired metrics, Frechet distance math, metrics CLI."""

import numpy as np
import pytest

from cfgpp_tpu.metrics import compute_stats, fid_from_features, frechet_distance, mse, psnr


def test_psnr_identity_and_known_value():
    a = np.random.RandomState(0).rand(8, 8, 3) * 255
    assert psnr(a, a) == float("inf")
    b = a + 10.0
    np.testing.assert_allclose(psnr(a, b, 255.0), 10 * np.log10(255.0**2 / 100.0),
                               rtol=1e-9)
    assert mse(a, b) == pytest.approx(100.0)


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    x = rng.randn(2000, 8)
    y = rng.randn(2000, 8) + 1.0   # shifted mean
    assert fid_from_features(x, x) == pytest.approx(0.0, abs=1e-6)
    d = fid_from_features(x, y)
    # mean shift of 1 in 8 dims -> |mu diff|^2 ~ 8
    assert 6.0 < d < 10.0
    # symmetric
    assert fid_from_features(y, x) == pytest.approx(d, rel=1e-6)


def test_frechet_distance_analytic():
    """Diagonal Gaussians: d^2 = |mu1-mu2|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    mu1, mu2 = np.zeros(3), np.ones(3)
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([1.0, 1.0, 1.0])
    want = 3.0 + (0 ** 2 + 1 ** 2 + 2 ** 2)
    got = frechet_distance(mu1, s1, mu2, s2, eps=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_metrics_cli(tmp_path):
    import json

    from cfgpp_tpu.cli.calculate_metrics import main
    from cfgpp_tpu.utils import save_image

    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    rng = np.random.RandomState(1)
    for i in range(3):
        img = rng.rand(16, 16, 3)
        save_image(img, a_dir / f"{i:05d}.png")
        save_image(np.clip(img + 0.05, 0, 1), b_dir / f"{i:05d}.png")
    out = tmp_path / "metrics.json"
    main(["--input_dir", str(a_dir), "--label_dir", str(b_dir), "--out", str(out)])
    res = json.loads(out.read_text())
    assert res["n_pairs"] == 3
    assert 20.0 < res["psnr"] < 40.0
    assert res["clip_fid"] is None


def test_clip_vision_parity_vs_transformers():
    """Tiny CLIP vision tower: converter + module vs transformers torch."""
    import torch
    from transformers import CLIPVisionConfig as HFC
    from transformers import CLIPVisionModelWithProjection as HFM

    import jax.numpy as jnp
    from cfgpp_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
    from cfgpp_tpu.weights.convert import convert_clip_vision

    hf_cfg = HFC(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=64, image_size=28, patch_size=14,
                 projection_dim=16, hidden_act="quick_gelu",
                 attention_dropout=0.0)
    torch.manual_seed(0)
    hf = HFM(hf_cfg).eval()
    params = convert_clip_vision({k: v.numpy() for k, v in hf.state_dict().items()})

    ours = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        image_size=28, patch_size=14, projection_dim=16))

    px = np.random.RandomState(0).rand(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).image_embeds.numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, atol=2e-5)
