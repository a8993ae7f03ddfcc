"""Pallas fused GroupNorm kernel tests (interpreter mode on CPU).

Verifies the two-pass stats/apply kernel against Flax `nn.GroupNorm` fp32
statistics across the model zoo's (C, groups) combinations, the SiLU
epilogue, multi-block row streaming, bf16 IO, and the `FusedGroupNorm`
module's parameter-tree compatibility with `nn.GroupNorm`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cfgpp_tpu.kernels.group_norm import (_pick_rows, group_norm_pallas,
                                          group_norm_xla)
from cfgpp_tpu.models.norm import FusedGroupNorm


def rand(b, n, c, dtype=jnp.float32, mean=2.0, std=3.0, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(mean, std, (b, n, c)), dtype)
    gamma = jnp.asarray(rng.normal(1.0, 0.2, (c,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0.0, 0.2, (c,)), jnp.float32)
    return x, gamma, beta


def flax_ref(x, gamma, beta, groups, eps, act):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y


@pytest.mark.parametrize("b,n,c,groups,act", [
    (2, 64, 320, 32, "silu"),    # SD/SDXL resnet (cpg=10)
    (1, 128, 1280, 32, None),    # transformer in-norm (cpg=40)
    (2, 32, 960, 32, "silu"),    # up-block concat channels (cpg=30)
    (1, 8, 128, 32, None),       # VAE smallest
    (2, 256, 640, 32, "silu"),   # multi-row-block path
])
def test_group_norm_matches_flax(b, n, c, groups, act):
    x, gamma, beta = rand(b, n, c)
    ref = flax_ref(x, gamma, beta, groups, 1e-5, act)
    got = group_norm_pallas(x, gamma, beta, groups, 1e-5, act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_group_norm_multiblock_streaming():
    """Rows far beyond one block: accumulation across the grid is exact."""
    b, n, c, g = 1, 4096, 128, 32
    x, gamma, beta = rand(b, n, c, mean=0.5, std=1.5)
    assert n // _pick_rows(n, c, 4) > 1  # actually exercises accumulation
    ref = flax_ref(x, gamma, beta, g, 1e-6, "silu")
    got = group_norm_pallas(x, gamma, beta, g, 1e-6, "silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_group_norm_bf16():
    x, gamma, beta = rand(2, 128, 640, jnp.bfloat16, mean=0.0, std=2.0)
    ref = group_norm_xla(x, gamma, beta, 32, 1e-6, "silu").astype(jnp.float32)
    got = group_norm_pallas(x, gamma, beta, 32, 1e-6, "silu",
                            interpret=True).astype(jnp.float32)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_xla_reference_matches_flax():
    x, gamma, beta = rand(2, 96, 320)
    ref = flax_ref(x, gamma, beta, 32, 1e-5, None)
    got = group_norm_xla(x, gamma, beta, 32, 1e-5, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_module_param_tree_matches_groupnorm():
    """Drop-in: same scale/bias tree as nn.GroupNorm -> converters unchanged."""
    x = jnp.ones((1, 8, 8, 64), jnp.float32)
    fused = FusedGroupNorm(num_groups=32, epsilon=1e-5, act="silu")
    plain = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    pf = fused.init(jax.random.PRNGKey(0), x)["params"]
    pp = plain.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pp)
    assert all(pf[k].shape == pp[k].shape for k in ("scale", "bias"))


def test_fused_module_nhwc_apply():
    b, h, w, c = 2, 8, 8, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(1.0, 2.0, (b, h, w, c)), jnp.float32)
    mod = FusedGroupNorm(num_groups=32, epsilon=1e-6, act="silu")
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    ref = flax_ref(x.reshape(b, h * w, c), jnp.ones((c,)), jnp.zeros((c,)),
                   32, 1e-6, "silu").reshape(b, h, w, c)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=3e-5)


def test_group_norm_fused_add():
    """The [B, C] bias-add (resnet time embedding) folds into the stats."""
    b, n, c, g = 2, 64, 320, 32
    x, gamma, beta = rand(b, n, c)
    t = jnp.asarray(np.random.default_rng(9).normal(0, 1, (b, c)), jnp.float32)
    ref = flax_ref(x + t[:, None, :], gamma, beta, g, 1e-5, "silu")
    got = group_norm_pallas(x, gamma, beta, g, 1e-5, "silu", add=t,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    xla = group_norm_xla(x, gamma, beta, g, 1e-5, "silu", add=t)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), atol=3e-5)


def test_group_norm_stats_kernel():
    """Stats-only kernel: [B, 2, G] mean/rstd from one streaming read."""
    from cfgpp_tpu.kernels.group_norm import group_norm_stats
    b, n, c, g = 2, 512, 320, 32
    x, _, _ = rand(b, n, c)
    stats = group_norm_stats(x, g, 1e-5, interpret=True)
    assert stats.shape == (b, 2, g)
    xg = np.asarray(x).reshape(b, n, g, c // g)
    mean = xg.mean(axis=(1, 3))
    rstd = 1.0 / np.sqrt(xg.var(axis=(1, 3)) + 1e-5)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats[:, 1]), rstd, rtol=1e-5)


def test_group_norm_hybrid_matches_flax():
    """Hybrid (Pallas stats + jnp normalize) — the in-model TPU form."""
    from cfgpp_tpu.kernels.group_norm import group_norm_hybrid
    b, n, c, g = 2, 128, 640, 32
    x, gamma, beta = rand(b, n, c)
    t = jnp.asarray(np.random.default_rng(5).normal(0, 1, (b, c)), jnp.float32)
    ref = flax_ref(x + t[:, None, :], gamma, beta, g, 1e-5, "silu")
    got = group_norm_hybrid(x, gamma, beta, g, 1e-5, "silu", add=t,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    ref2 = flax_ref(x, gamma, beta, g, 1e-6, None)
    got2 = group_norm_hybrid(x, gamma, beta, g, 1e-6, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=3e-5)
