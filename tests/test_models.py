"""Model architecture tests.

Real-config architectures are validated by exact parameter counts (cheap via
jax.eval_shape — no weights, no memory): any structural deviation from the
HF reference architectures (wrong block wiring, missing projection, wrong
head counts) shifts the count.  Golden counts are the published sizes of the
checkpoints the reference loads:
  SD-1.5 UNet 859,520,964 / SDXL UNet 2,567,463,684 / VAE 83,653,863 /
  CLIP ViT-L text 123,060,480 / OpenCLIP bigG text 694,659,840.
Tiny configs then run real forwards for numerics/shape checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.configs import (
    get_bundle_config,
    sd15_config,
    sdxl_config,
    tiny_sd_config,
    tiny_sdxl_config,
)
from cfgpp_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def shape_init(module, *args):
    return jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args))


# ---------------------------------------------------------------------------
# exact parameter-count goldens (architecture fingerprints)
# ---------------------------------------------------------------------------

def test_sd15_unet_param_count():
    cfg = sd15_config().unet
    m = UNet2DConditionModel(cfg)
    v = shape_init(m, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 77, 768)))
    assert n_params(v) == 859_520_964


def test_sdxl_unet_param_count():
    cfg = sdxl_config().unet
    m = UNet2DConditionModel(cfg)
    v = shape_init(m, jnp.zeros((1, 128, 128, 4)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 77, 2048)), jnp.zeros((1, 1280)), jnp.zeros((1, 6)))
    assert n_params(v) == 2_567_463_684


def test_vae_param_count():
    m = AutoencoderKL(sd15_config().vae)
    v = shape_init(m, jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(0))
    assert n_params(v) == 83_653_863


def test_clip_vitl_param_count():
    m = CLIPTextModel(sd15_config().text_encoder)
    v = shape_init(m, jnp.zeros((1, 77), jnp.int32))
    assert n_params(v) == 123_060_480


def test_openclip_bigg_param_count():
    m = CLIPTextModel(sdxl_config().text_encoder_2)
    v = shape_init(m, jnp.zeros((1, 77), jnp.int32))
    assert n_params(v) == 694_659_840


# ---------------------------------------------------------------------------
# tiny-config forward passes
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_sd():
    return tiny_sd_config()


def test_tiny_unet_forward(tiny_sd):
    m = UNet2DConditionModel(tiny_sd.unet, dtype=jnp.float32, param_dtype=jnp.float32)
    x = jnp.ones((2, 8, 8, 4))
    ctx = jnp.ones((2, 77, tiny_sd.unet.cross_attention_dim))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([10, 10]), ctx)
    out = m.apply(params, x, jnp.array([10, 10]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())
    # timestep must matter
    out2 = m.apply(params, x, jnp.array([500, 500]), ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # context must matter (cross-attention wired)
    out3 = m.apply(params, x, jnp.array([10, 10]), ctx * 0.0)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_cross_kv_cache_matches_uncached(tiny_sd):
    """precompute_cross_kv + cross_kv= must be BIT-identical to the plain
    forward (same padded context, same contraction per site) — the engine
    hoists these matmuls out of the sampling scan on this guarantee."""
    from cfgpp_tpu.models.unet import precompute_cross_kv
    m = UNet2DConditionModel(tiny_sd.unet, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    x = jnp.linspace(-1, 1, 2 * 8 * 8 * 4).reshape(2, 8, 8, 4)
    key = jax.random.PRNGKey(3)
    ctx = jax.random.normal(key, (2, 77, tiny_sd.unet.cross_attention_dim))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([10, 10]), ctx)
    base = m.apply(params, x, jnp.array([10, 10]), ctx)
    ckv = precompute_cross_kv(params, tiny_sd.unet, ctx, dtype=jnp.float32)
    cached = m.apply(params, x, jnp.array([10, 10]), ctx, cross_kv=ckv)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


def test_cross_kv_cache_matches_uncached_sdxl():
    from cfgpp_tpu.models.unet import precompute_cross_kv
    cfg = tiny_sdxl_config()
    m = UNet2DConditionModel(cfg.unet, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    x = jnp.ones((2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(5),
                            (2, 77, cfg.unet.cross_attention_dim))
    te = jnp.ones((2, 48))
    tid = jnp.asarray([[64, 64, 0, 0, 64, 64]] * 2, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([10, 10]), ctx, te, tid)
    base = m.apply(params, x, jnp.array([10, 10]), ctx, te, tid)
    ckv = precompute_cross_kv(params, cfg.unet, ctx, dtype=jnp.float32)
    cached = m.apply(params, x, jnp.array([10, 10]), ctx, te, tid,
                     cross_kv=ckv)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


def test_tiny_sdxl_unet_micro_conditioning():
    cfg = tiny_sdxl_config()
    m = UNet2DConditionModel(cfg.unet, dtype=jnp.float32, param_dtype=jnp.float32)
    x = jnp.ones((1, 8, 8, 4))
    ctx = jnp.ones((1, 77, cfg.unet.cross_attention_dim))
    te = jnp.ones((1, 48))
    tid = jnp.asarray([[64, 64, 0, 0, 64, 64]], jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx, te, tid)
    out = m.apply(params, x, jnp.array([10]), ctx, te, tid)
    assert out.shape == (1, 8, 8, 4)
    # micro-conditioning must matter (latent_sdxl.py:187-198)
    out2 = m.apply(params, x, jnp.array([10]), ctx, te,
                   jnp.asarray([[32, 32, 0, 0, 32, 32]], jnp.float32))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # omitting added conds must raise
    with pytest.raises(ValueError, match="added_"):
        m.apply(params, x, jnp.array([10]), ctx)


def test_tiny_clip_outputs(tiny_sd):
    m = CLIPTextModel(tiny_sd.text_encoder)
    ids = jnp.asarray([[1, 5, 7, 999, 0, 0, 0, 0]], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.last_hidden_state.shape == (1, 8, 32)
    assert out.penultimate_hidden_state.shape == (1, 8, 32)
    assert out.pooled_output.shape == (1, 32)
    # causal mask: truncating the tail must not change earlier positions
    ids2 = ids.at[0, 3].set(42)
    out2 = m.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out.last_hidden_state[0, :3]),
                               np.asarray(out2.last_hidden_state[0, :3]), atol=1e-6)
    assert not np.allclose(np.asarray(out.last_hidden_state[0, 3:]),
                           np.asarray(out2.last_hidden_state[0, 3:]))


def test_tiny_clip_projection():
    cfg = tiny_sdxl_config().text_encoder_2
    m = CLIPTextModel(cfg)
    ids = jnp.asarray([[1, 5, 999, 0]], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.pooled_output.shape == (1, cfg.projection_dim)


def test_tiny_vae_roundtrip(tiny_sd):
    m = AutoencoderKL(tiny_sd.vae)
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    key = jax.random.PRNGKey(0)
    params = m.init(key, x, key)
    mean, logvar = m.apply(params, x, method=m.encode)
    f = tiny_sd.vae.scale_factor
    assert mean.shape == (1, 32 // f, 32 // f, 4)
    z = m.apply(params, x, key, method=m.sample_latent)
    img = m.apply(params, z, method=m.decode)
    assert img.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())


def test_model_registry():
    for name in ("sd15", "sd20", "sd21", "sdxl", "sdxl_lightning", "tiny_sd", "tiny_sdxl"):
        cfg = get_bundle_config(name)
        assert cfg.unet.block_out_channels
    with pytest.raises(ValueError):
        get_bundle_config("sd99")
