"""Int8 W8A8 quantization tests (models/quant.py, weights/quantize.py).

Covers: QuantDense vs nn.Dense numerics on random weights, the param-tree
transform (which layers convert, which stay bf16), and an end-to-end
quantized tiny-UNet forward whose output must stay close to the exact path.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cfgpp_tpu.models.quant import (QuantDense, quantize_activation_int8,
                                    quantize_kernel_int8)
from cfgpp_tpu.weights.quantize import quantize_unet_params

pytestmark = pytest.mark.slow  # >60s-class integration module: run via the full suite (pytest tests/ -q); the default dev selection is -m "not slow" (see pyproject)


def test_quant_dense_matches_dense():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 64, 128), jnp.float32)
    dense = nn.Dense(256, dtype=jnp.float32)
    params = dense.init(key, x)
    ref = dense.apply(params, x)

    kq, scale = quantize_kernel_int8(params["params"]["kernel"])
    qparams = {"params": {"kernel": jnp.asarray(kq), "scale": jnp.asarray(scale),
                          "bias": jnp.asarray(params["params"]["bias"], jnp.float32)}}
    out = QuantDense(256, dtype=jnp.float32).apply(qparams, x)
    # W8A8 with per-token/per-channel scales: ~1% relative error expected
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


def test_quant_dense_no_bias():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 32), jnp.float32)
    dense = nn.Dense(64, use_bias=False, dtype=jnp.float32)
    params = dense.init(key, x)
    ref = dense.apply(params, x)
    kq, scale = quantize_kernel_int8(params["params"]["kernel"])
    out = QuantDense(64, use_bias=False, dtype=jnp.float32).apply(
        {"params": {"kernel": jnp.asarray(kq), "scale": jnp.asarray(scale)}}, x)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


def test_quantize_activation_zero_row_safe():
    x = jnp.zeros((2, 8))
    xq, sx = quantize_activation_int8(x)
    assert bool(jnp.isfinite(sx).all())
    assert int(jnp.abs(xq).max()) == 0


def test_quantize_kernel_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(128, 64)).astype(np.float32)
    kq, scale = quantize_kernel_int8(k)
    deq = kq.astype(np.float32) * scale
    assert np.abs(deq - k).max() < np.abs(k).max() / 100


def test_quantize_unet_params_selectivity():
    """Attention/ff/linear-proj kernels convert; convs and time-emb don't."""
    params = {"params": {
        "down_blocks_1_attentions_0": {
            "transformer_blocks_0": {
                "attn1": {"to_q": {"kernel": np.ones((8, 8), np.float32)},
                          "to_out": {"kernel": np.ones((8, 8), np.float32),
                                     "bias": np.zeros(8, np.float32)}},
                "ff": {"net_0_proj": {"kernel": np.ones((8, 64), np.float32),
                                      "bias": np.zeros(64, np.float32)}},
            },
            "proj_in": {"kernel": np.ones((8, 8), np.float32)},
        },
        # SD-1.5 conv-style proj_in (4D 1x1 kernel): converts as a conv —
        # it IS a matmul and routes through int8_matmul via QuantConv
        "down_blocks_0_attentions_0": {
            "proj_in": {"kernel": np.ones((1, 1, 8, 8), np.float32)},
        },
        "time_embedding": {"linear_1": {"kernel": np.ones((8, 32), np.float32),
                                        "bias": np.zeros(32, np.float32)}},
        "conv_in": {"kernel": np.ones((3, 3, 4, 8), np.float32)},
    }}
    q = quantize_unet_params(params)
    tb = q["params"]["down_blocks_1_attentions_0"]["transformer_blocks_0"]
    assert tb["attn1"]["to_q"]["kernel"].dtype == jnp.int8
    assert "scale" in tb["attn1"]["to_q"]
    assert tb["attn1"]["to_out"]["bias"].dtype == jnp.float32
    assert tb["ff"]["net_0_proj"]["kernel"].dtype == jnp.int8
    assert q["params"]["down_blocks_1_attentions_0"]["proj_in"]["kernel"].dtype == jnp.int8
    proj1x1 = q["params"]["down_blocks_0_attentions_0"]["proj_in"]
    assert proj1x1["kernel"].dtype == jnp.int8 and "scale" in proj1x1
    # untouched:
    assert q["params"]["time_embedding"]["linear_1"]["kernel"].dtype == np.float32
    assert q["params"]["conv_in"]["kernel"].dtype == np.float32


def test_qkv_packing_matches_separate():
    """Packed to_qkv == concat of per-projection quantizations (per-output-
    channel scales commute with the channel concat)."""
    rng = np.random.default_rng(5)
    mk = lambda: {"kernel": rng.normal(size=(16, 16)).astype(np.float32)}
    tree = {"attn1": {"to_q": mk(), "to_k": mk(), "to_v": mk(),
                      "to_out": {"kernel": rng.normal(size=(16, 16)).astype(np.float32),
                                 "bias": np.zeros(16, np.float32)}}}
    q = quantize_unet_params(tree)
    a = q["attn1"]
    assert set(a) == {"to_qkv", "to_out"}
    assert a["to_qkv"]["kernel"].shape == (16, 48)
    assert a["to_qkv"]["kernel"].dtype == jnp.int8
    for i, name in enumerate(("to_q", "to_k", "to_v")):
        kq, scale = quantize_kernel_int8(tree["attn1"][name]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(a["to_qkv"]["kernel"][:, 16 * i:16 * (i + 1)]),
            np.asarray(kq))
        np.testing.assert_allclose(
            np.asarray(a["to_qkv"]["scale"][16 * i:16 * (i + 1)]),
            np.asarray(scale), rtol=1e-6)


def test_quantized_tiny_unet_forward_close():
    from cfgpp_tpu.engine import ModelBundle
    bundle = ModelBundle.random_init("tiny_sdxl", dtype=jnp.float32,
                                     param_dtype=jnp.float32)
    qb = bundle.quantized()
    assert qb.unet.quant and not bundle.unet.quant

    key = jax.random.PRNGKey(0)
    ctx_dim = bundle.config.unet.cross_attention_dim
    pooled = bundle.config.text_encoder_2.projection_dim
    z = jax.random.normal(key, (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(key, (2, 77, ctx_dim), jnp.float32)
    pool = jax.random.normal(key, (2, pooled), jnp.float32)
    tids = jnp.ones((2, 6), jnp.float32)
    t = jnp.asarray([500, 500])

    ref = bundle.unet.apply(bundle.unet_params, z, t, ctx, pool, tids)
    out = qb.unet.apply(qb.unet_params, z, t, ctx, pool, tids)
    assert out.shape == ref.shape
    # int8 projections perturb eps mildly; the signal must survive
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel


def test_quantized_cross_kv_cache_matches_uncached():
    """The hoisted cross-attn kv cache must be bit-identical on the quant
    path too (same quant_dense_apply/int8_matmul over the same context)."""
    from cfgpp_tpu.engine import ModelBundle
    from cfgpp_tpu.models.unet import precompute_cross_kv
    qb = ModelBundle.random_init("tiny_sdxl", dtype=jnp.float32,
                                 param_dtype=jnp.float32).quantized()
    key = jax.random.PRNGKey(7)
    z = jax.random.normal(key, (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(key, (2, 77, qb.config.unet.cross_attention_dim))
    pool = jnp.ones((2, qb.config.text_encoder_2.projection_dim))
    tids = jnp.ones((2, 6), jnp.float32)
    t = jnp.asarray([500, 500])
    base = qb.unet.apply(qb.unet_params, z, t, ctx, pool, tids)
    ckv = precompute_cross_kv(qb.unet_params, qb.config.unet, ctx,
                              quant=qb.unet.quant, dtype=jnp.float32)
    cached = qb.unet.apply(qb.unet_params, z, t, ctx, pool, tids,
                           cross_kv=ckv)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))


def test_quantized_tiny_engine_sample_runs():
    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle
    bundle = ModelBundle.random_init("tiny_sdxl", dtype=jnp.float32,
                                     param_dtype=jnp.float32).quantized()
    engine = DiffusionEngine(bundle, solver="ddim_cfg++", nfe=2)
    img = engine.sample(["", "a cat"], cfg_guidance=2.0, seed=0, resolution=16)
    assert img.shape == (1, 16, 16, 3)
    assert bool(np.isfinite(img).all())


def test_quant_conv_matches_conv():
    key = jax.random.PRNGKey(3)
    from cfgpp_tpu.models.quant import QuantConv, quantize_conv_kernel_int8
    x = jax.random.normal(key, (2, 16, 16, 32), jnp.float32)
    conv = nn.Conv(64, (3, 3), padding=1, dtype=jnp.float32)
    params = conv.init(key, x)
    ref = conv.apply(params, x)
    kq, scale = quantize_conv_kernel_int8(params["params"]["kernel"])
    out = QuantConv(64, (3, 3), padding=1, dtype=jnp.float32).apply(
        {"params": {"kernel": jnp.asarray(kq), "scale": jnp.asarray(scale),
                    "bias": jnp.asarray(params["params"]["bias"], jnp.float32)}}, x)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel


def test_quant_conv_strided_matches():
    key = jax.random.PRNGKey(4)
    from cfgpp_tpu.models.quant import QuantConv, quantize_conv_kernel_int8
    x = jax.random.normal(key, (1, 16, 16, 8), jnp.float32)
    conv = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                   dtype=jnp.float32)
    params = conv.init(key, x)
    ref = conv.apply(params, x)
    kq, scale = quantize_conv_kernel_int8(params["params"]["kernel"])
    out = QuantConv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=jnp.float32).apply(
        {"params": {"kernel": jnp.asarray(kq), "scale": jnp.asarray(scale),
                    "bias": jnp.asarray(params["params"]["bias"], jnp.float32)}}, x)
    assert out.shape == ref.shape
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel


def test_quantized_dense_mode_keeps_convs_bf16():
    """mode='dense' (the default, and the config that wins end-to-end on
    v5e) quantizes transformer projections but leaves resnet convs bf16."""
    import jax.numpy as jnp
    from cfgpp_tpu.engine import ModelBundle

    bundle = ModelBundle.random_init("tiny_sdxl", dtype=jnp.float32,
                                     param_dtype=jnp.float32)
    qb = bundle.quantized(mode="dense")
    assert qb.unet.quant == "dense"

    def walk(tree, name, path=()):
        if isinstance(tree, dict):
            k = tree.get("kernel")
            if k is not None:
                yield name, k
            for key, v in tree.items():
                yield from walk(v, key, path + (key,))
    kinds = {}
    for name, k in walk(qb.unet_params["params"], ""):
        kinds.setdefault(name, set()).add((k.ndim, k.dtype.name))
    # transformer projections went int8; attn1 q/k/v packed into to_qkv
    # (remaining to_q entries are the cross-attention attn2 ones)
    assert kinds["to_q"] == {(2, "int8")}
    assert kinds["to_qkv"] == {(2, "int8")}
    assert kinds["net_0_proj"] == {(2, "int8")}
    # resnet convs stayed floating point
    assert all(d != "int8" for _, d in kinds["conv1"])
    assert all(d != "int8" for _, d in kinds["conv2"])


def test_quantized_tiny_sd_conv_layout_forward_close():
    """SD15 layout (use_linear_projection=False): 1x1-conv transformer
    projections quantize and route through the matmul path; forward must
    stay close to bf16."""
    from cfgpp_tpu.engine import ModelBundle
    bundle = ModelBundle.random_init("tiny_sd", dtype=jnp.float32,
                                     param_dtype=jnp.float32)
    qb = bundle.quantized(mode="all")
    # the conv-layout proj params must be int8 in the transformed tree
    import jax as _jax
    leaves = _jax.tree_util.tree_leaves_with_path(qb.unet_params)
    proj_kernels = [(p, l) for p, l in leaves
                    if "proj_in" in str(p) and "kernel" in str(p)]
    assert proj_kernels and all(l.dtype == jnp.int8 for _, l in proj_kernels)

    key = jax.random.PRNGKey(1)
    ctx_dim = bundle.config.unet.cross_attention_dim
    z = jax.random.normal(key, (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(key, (2, 77, ctx_dim), jnp.float32)
    t = jnp.asarray([500, 500])

    ref = bundle.unet.apply(bundle.unet_params, z, t, ctx)
    out = qb.unet.apply(qb.unet_params, z, t, ctx)
    assert out.shape == ref.shape
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel
