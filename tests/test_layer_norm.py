"""Pallas LayerNorm-stats kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cfgpp_tpu.kernels.layer_norm import (layer_norm_hybrid, layer_norm_stats,
                                          layer_norm_xla)
from cfgpp_tpu.models.norm import FusedLayerNorm


def rand(b, n, c, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(1.0, 2.0, (b, n, c)), dtype)
    gamma = jnp.asarray(rng.normal(1.0, 0.2, (c,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0.0, 0.2, (c,)), jnp.float32)
    return x, gamma, beta


def flax_ref(x, gamma, beta, eps):
    ln = nn.LayerNorm(epsilon=eps)
    return ln.apply({"params": {"scale": gamma, "bias": beta}}, x)


def test_layer_norm_stats_kernel():
    b, n, c = 2, 64, 320
    x, _, _ = rand(b, n, c)
    stats = layer_norm_stats(x, 1e-5, interpret=True)
    assert stats.shape == (b, n, 2)
    xn = np.asarray(x)
    mean = xn.mean(axis=-1)
    rstd = 1.0 / np.sqrt(xn.var(axis=-1) + 1e-5)
    np.testing.assert_allclose(np.asarray(stats[..., 0]), mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats[..., 1]), rstd, rtol=1e-5)


@pytest.mark.parametrize("b,n,c", [
    (2, 64, 640),     # SDXL level-1 channels
    (2, 256, 1280),   # level-2, multi-block rows
    (1, 8, 320),      # minimum rows
])
def test_layer_norm_hybrid_matches_flax(b, n, c):
    x, gamma, beta = rand(b, n, c)
    ref = flax_ref(x, gamma, beta, 1e-5)
    got = layer_norm_hybrid(x, gamma, beta, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    xla = layer_norm_xla(x, gamma, beta, 1e-5)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), atol=3e-5)


def test_layer_norm_bf16():
    x, gamma, beta = rand(2, 128, 640, jnp.bfloat16)
    ref = flax_ref(x.astype(jnp.float32), gamma, beta, 1e-5)
    got = layer_norm_hybrid(x, gamma, beta, 1e-5,
                            interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=4e-2)


def test_fused_module_param_tree_matches_layernorm():
    x = jnp.ones((1, 8, 64), jnp.float32)
    fused = FusedLayerNorm(epsilon=1e-5)
    plain = nn.LayerNorm(epsilon=1e-5)
    pf = fused.init(jax.random.PRNGKey(0), x)["params"]
    pp = plain.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pp)
    assert all(pf[k].shape == pp[k].shape for k in ("scale", "bias"))


def test_fused_module_apply():
    b, n, c = 2, 16, 128
    x, gamma, beta = rand(b, n, c, seed=7)
    mod = FusedLayerNorm(epsilon=1e-5)
    y = mod.apply({"params": {"scale": gamma, "bias": beta}}, x)
    ref = flax_ref(x, gamma, beta, 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=3e-5)


def test_residual_layer_norm_stats():
    from cfgpp_tpu.kernels.layer_norm import (apply_norm_stats,
                                              residual_layer_norm_stats)
    b, n, c = 2, 64, 320
    x, gamma, beta = rand(b, n, c, seed=11)
    y = jnp.asarray(np.random.default_rng(12).normal(0, 1, (b, n, c)), jnp.float32)
    z, stats = residual_layer_norm_stats(x, y, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x + y), atol=1e-6)
    ref = flax_ref(x + y, gamma, beta, 1e-5)
    got = apply_norm_stats(z, stats, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_residual_fused_module():
    from cfgpp_tpu.models.norm import ResidualFusedLayerNorm
    b, n, c = 2, 16, 128
    x, gamma, beta = rand(b, n, c, seed=13)
    y = jnp.asarray(np.random.default_rng(14).normal(0, 1, (b, n, c)), jnp.float32)
    mod = ResidualFusedLayerNorm(epsilon=1e-5)
    params = {"params": {"scale": gamma, "bias": beta}}
    z, h = mod.apply(params, x, y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x + y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(flax_ref(x + y, gamma, beta, 1e-5)), atol=3e-5)
    z0, h0 = mod.apply(params, x)          # pending=None path
    np.testing.assert_allclose(np.asarray(z0), np.asarray(x), atol=0)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(flax_ref(x, gamma, beta, 1e-5)), atol=3e-5)
    # param tree parity with nn.LayerNorm
    pf = mod.init(jax.random.PRNGKey(0), x)["params"]
    pp = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pp)
