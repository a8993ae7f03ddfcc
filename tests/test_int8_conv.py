"""Pallas W8A8 fused 3x3 conv kernel tests (interpreter mode on CPU).

The kernel quantizes per (sample, row-window) with int32 accumulation;
`int8_conv3x3_reference` replicates that recipe exactly in pure jnp, so
the primary check is bitwise-in-f32.  A secondary check bounds the drift
vs the exact f32 convolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.kernels.int8_conv import (int8_conv3x3, int8_conv3x3_reference,
                                         int8_conv3x3_supported)
from cfgpp_tpu.models.quant import quantize_conv_kernel_int8


def _case(b, h, w, c, o, seed, bias=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.float32)
    wf = rng.normal(0, 0.05, (3, 3, c, o)).astype(np.float32)
    wq, ws = quantize_conv_kernel_int8(jnp.asarray(wf))
    bv = jnp.asarray(rng.normal(0, 0.1, (o,)), jnp.float32) if bias else None
    return x, wf, jnp.asarray(wq), jnp.asarray(ws), bv


@pytest.mark.parametrize("b,h,w,c,o,br,bo,bias", [
    (1, 8, 8, 128, 128, 4, 128, True),     # multi row-block, H halo crossing
    (2, 8, 16, 128, 256, 8, 128, True),    # batch>1: blocks must not mix samples
    (1, 16, 8, 256, 128, 4, 128, False),   # no bias
    (2, 4, 8, 128, 128, 4, 128, True),     # block == whole sample height
])
def test_int8_conv3x3_matches_reference_recipe(b, h, w, c, o, br, bo, bias):
    x, wf, wq, ws, bv = _case(b, h, w, c, o, seed=h * w + c, bias=bias)
    ref = int8_conv3x3_reference(x, wq, ws, bv, block_rows=br)
    got = int8_conv3x3(x, wq, ws, bv, block_rows=br, block_o=bo,
                       interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (b, h, w, o)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_int8_conv3x3_close_to_exact_f32_conv():
    x, wf, wq, ws, bv = _case(2, 8, 8, 128, 128, seed=11)
    exact = jax.lax.conv_general_dilated(
        x, jnp.asarray(wf), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bv
    got = int8_conv3x3(x, wq, ws, bv, block_rows=4, block_o=128,
                       interpret=True)
    e = np.abs(np.asarray(got, np.float32) - np.asarray(exact, np.float32))
    assert e.max() / np.abs(np.asarray(exact)).max() < 0.02


def test_int8_conv3x3_sample_isolation():
    """Changing sample 1 must not change sample 0's output (halo rows are
    clamped+masked at sample boundaries, never read across them)."""
    x, wf, wq, ws, bv = _case(2, 8, 8, 128, 128, seed=5)
    y1 = int8_conv3x3(x, wq, ws, bv, block_rows=4, block_o=128, interpret=True)
    x2 = x.at[1].mul(3.0)
    y2 = int8_conv3x3(x2, wq, ws, bv, block_rows=4, block_o=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(y1[0]), np.asarray(y2[0]))
    assert not np.array_equal(np.asarray(y1[1]), np.asarray(y2[1]))


def test_int8_conv3x3_auto_blocks_and_guards():
    x, wf, wq, ws, bv = _case(1, 8, 8, 128, 128, seed=3)
    got = int8_conv3x3(x, wq, ws, bv, interpret=True)   # auto block pick
    ref = int8_conv3x3_reference(x, wq, ws, bv)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
    with pytest.raises(ValueError, match="divide H"):
        int8_conv3x3(x, wq, ws, bv, block_rows=3, block_o=128, interpret=True)
    with pytest.raises(ValueError, match="divide O"):
        int8_conv3x3(x, wq, ws, bv, block_rows=4, block_o=96, interpret=True)
    with pytest.raises(ValueError, match="weights"):
        int8_conv3x3(x, wq[:1], ws, bv, interpret=True)


def test_supported_predicate():
    assert int8_conv3x3_supported((4, 128, 128, 320), (1, 1), 1)
    assert int8_conv3x3_supported((4, 32, 32, 1280), (1, 1), ((1, 1), (1, 1)))
    assert not int8_conv3x3_supported((4, 64, 64, 320), (2, 2), 1)   # strided
    assert not int8_conv3x3_supported((4, 2, 2, 320), (1, 1), 1)     # tiny
    assert not int8_conv3x3_supported((4, 64, 64, 4), (1, 1), 1)     # thin C


def test_int8_conv3x3_fused_gn_silu_residual():
    """gn_scale/gn_bias + residual fusion == silu-affine prologue ->
    reference recipe -> skip add.

    The kernel normalizes+silus the VMEM window then re-zeros the pad
    columns; applying the same affine+silu to x on the host and running
    the plain reference (whose own zero padding is equivalent) must match
    bitwise-in-f32.
    """
    x, wf, wq, ws, bv = _case(2, 8, 16, 128, 128, seed=23)
    rng = np.random.default_rng(29)
    gs = jnp.asarray(rng.normal(1, 0.2, (2, 128)), jnp.float32)
    gb = jnp.asarray(rng.normal(0, 0.3, (2, 128)), jnp.float32)
    res = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 128)), jnp.bfloat16)

    ref = int8_conv3x3_reference(x, wq, ws, bv, gn_scale=gs, gn_bias=gb,
                                 residual=res, block_rows=4)
    got = int8_conv3x3(x, wq, ws, bv, gn_scale=gs, gn_bias=gb, residual=res,
                       block_rows=4, block_o=128, interpret=True)
    assert got.shape == (2, 8, 16, 128)
    # near-bitwise: the sigmoid in the fused silu compiles with different
    # FMA contractions in the two graphs, so a value sitting exactly on a
    # quantization boundary can flip by one int8 step (observed: 1-2
    # elements in 32k, one bf16 ulp each).  Everything else must be exact.
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    np.testing.assert_allclose(g, r, atol=0.01, rtol=0)
    assert (g != r).mean() < 1e-3


def test_groupnorm_silu_coeffs_match_groupnorm():
    """The collapsed affine (incl. absorbed time-emb add) must reproduce
    flax GroupNorm + temb semantics in f32."""
    import flax.linen as fnn

    from cfgpp_tpu.models.quant import groupnorm_silu_coeffs
    rng = np.random.default_rng(31)
    b, h, w, c, groups = 2, 4, 8, 64, 8
    x = jnp.asarray(rng.normal(0, 2, (b, h, w, c)), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1, (b, c)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.2, (c,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.3, (c,)), jnp.float32)

    gn = fnn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32)
    params = {"params": {"scale": gamma, "bias": beta}}
    ref = fnn.silu(gn.apply(params, x + t[:, None, None, :]))

    s, bb = groupnorm_silu_coeffs(x, gamma, beta, groups, temb=t)
    got = fnn.silu(x * s[:, None, None, :] + bb[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
