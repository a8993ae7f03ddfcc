"""Pallas W8A8 int8 matmul kernel tests (interpreter mode on CPU).

The kernel must reproduce models/quant.py's QuantDense recipe exactly:
per-row dynamic activation absmax, symmetric int8, int32 accumulation,
rank-1 dequant, f32 bias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.kernels.int8_matmul import int8_matmul
from cfgpp_tpu.models.quant import (quantize_activation_int8,
                                    quantize_kernel_int8)


def xla_ref(x, wq, ws, bias=None):
    xq, sx = quantize_activation_int8(x)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * ws
    if bias is not None:
        y = y + bias
    return y.astype(jnp.bfloat16)


@pytest.mark.parametrize("m,k,n,bias", [
    (64, 320, 512, True),
    (100, 1280, 1024, True),    # ragged M -> padded row blocks
    (64, 640, 512, False),
    (8, 2560, 1280, True),      # deep K
])
def test_int8_matmul_matches_quantdense_recipe(m, k, n, bias):
    rng = np.random.default_rng(m + n)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    wq, ws = quantize_kernel_int8(rng.normal(0, 0.05, (k, n)).astype(np.float32))
    wq, ws = jnp.asarray(wq), jnp.asarray(ws)
    b = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32) if bias else None
    ref = xla_ref(x, wq, ws, b)
    got = int8_matmul(x, wq, ws, b, interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (m, n)
    e = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert e.max() / np.abs(np.asarray(ref, np.float32)).max() < 0.02


def test_int8_matmul_batched_leading_dims():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 320)), jnp.bfloat16)
    wq, ws = quantize_kernel_int8(rng.normal(0, 0.05, (320, 256)).astype(np.float32))
    got = int8_matmul(x, jnp.asarray(wq), jnp.asarray(ws), interpret=True)
    ref = xla_ref(x.reshape(64, 320), jnp.asarray(wq), jnp.asarray(ws))
    assert got.shape == (2, 32, 256)
    e = np.abs(np.asarray(got, np.float32).reshape(64, 256) - np.asarray(ref, np.float32))
    assert e.max() / np.abs(np.asarray(ref, np.float32)).max() < 0.02


def test_int8_matmul_deep_k():
    """Deep-K (ff-out class, K=5120): VMEM forces small row blocks but the
    whole-K path must stay exact vs the f32 matmul and the W8A8 recipe."""
    rng = np.random.default_rng(7)
    m, k, n = 64, 5120, 256
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    w = rng.normal(0, 0.05, (k, n)).astype(np.float32)
    wq, ws = quantize_kernel_int8(jnp.asarray(w))
    got = int8_matmul(x, wq, ws, interpret=True)
    exact = np.asarray(x, np.float32) @ w
    ref = np.asarray(xla_ref(x, wq, ws), np.float32)
    scale = np.abs(exact).max()
    assert np.abs(np.asarray(got, np.float32) - exact).max() / scale < 0.02
    assert np.abs(np.asarray(got, np.float32) - ref).max() / scale < 0.02


@pytest.mark.parametrize("m,k,n,o,bc", [
    (100, 256, 512, 256, 128),   # chunked stage-1, ragged M
    (64, 320, 1280, 320, None),  # full-N single chunk (the measured-best)
])
def test_int8_ff_geglu_matches_two_stage(m, k, n, o, bc):
    """Fused FF == QuantDense recipe -> exact gelu-GEGLU -> QuantDense
    recipe, with the hidden-state requantization from f32."""
    import math

    from cfgpp_tpu.kernels.int8_matmul import int8_ff_geglu
    from cfgpp_tpu.models.quant import quantize_activation_int8
    rng = np.random.default_rng(m + n)
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    w1q, w1s = quantize_kernel_int8(rng.normal(0, 0.05, (k, 2 * n)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (2 * n,)), jnp.float32)
    w2q, w2s = quantize_kernel_int8(rng.normal(0, 0.05, (n, o)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (o,)), jnp.float32)

    proj = np.asarray(xla_ref(x, w1q, w1s, b1), np.float32)
    v, g = proj[:, :n], proj[:, n:]
    h = v * (g * 0.5 * (1.0 + np.vectorize(math.erf)(g / np.sqrt(2.0))))
    hq, sh = quantize_activation_int8(jnp.asarray(h))
    acc = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ref = np.asarray(acc.astype(jnp.float32) * sh * w2s + b2)

    got = int8_ff_geglu(x, w1q, w1s, b1, w2q, w2s, b2, block_c=bc,
                        interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (m, o)
    e = np.abs(np.asarray(got, np.float32) - ref)
    assert e.max() / max(np.abs(ref).max(), 1e-6) < 0.02


def test_int8_ff_geglu_sigmoid_flavor():
    """gelu="sigmoid" (opt-in cheaper epilogue) must match the same
    two-stage recipe with x*sigmoid(1.702x) as the activation, and the
    flavor plumbing must reject unknown names."""
    import pytest

    from cfgpp_tpu.kernels.int8_matmul import int8_ff_geglu
    from cfgpp_tpu.models.quant import quantize_activation_int8
    rng = np.random.default_rng(11)
    m, k, n, o = 64, 128, 256, 128
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    w1q, w1s = quantize_kernel_int8(rng.normal(0, 0.05, (k, 2 * n)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (2 * n,)), jnp.float32)
    w2q, w2s = quantize_kernel_int8(rng.normal(0, 0.05, (n, o)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (o,)), jnp.float32)

    proj = np.asarray(xla_ref(x, w1q, w1s, b1), np.float32)
    v, g = proj[:, :n], proj[:, n:]
    h = v * (g / (1.0 + np.exp(-1.702 * g)))
    hq, sh = quantize_activation_int8(jnp.asarray(h))
    acc = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ref = np.asarray(acc.astype(jnp.float32) * sh * w2s + b2)

    got = int8_ff_geglu(x, w1q, w1s, b1, w2q, w2s, b2, gelu="sigmoid",
                        interpret=True)
    e = np.abs(np.asarray(got, np.float32) - ref)
    assert e.max() / max(np.abs(ref).max(), 1e-6) < 0.02

    with pytest.raises(ValueError, match="CFGPP_GELU"):
        int8_ff_geglu(x, w1q, w1s, b1, w2q, w2s, b2, gelu="tanh",
                      interpret=True)


def test_int8_matmul_fused_ln_and_residual():
    """ln_scale/ln_bias + residual fusion == layernorm_ref -> recipe -> add.

    The fused pre-LN must match models/quant.py:layernorm_ref (the non-TPU
    fallback the quant transformer block uses), and the fused residual must
    add in f32 before the bf16 cast.
    """
    from cfgpp_tpu.models.quant import layernorm_ref
    rng = np.random.default_rng(7)
    m, k, n = 100, 320, 512
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    wq, ws = quantize_kernel_int8(rng.normal(0, 0.05, (k, n)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)
    g = jnp.asarray(rng.normal(1, 0.1, (k,)), jnp.bfloat16)
    be = jnp.asarray(rng.normal(0, 0.1, (k,)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 1, (m, n)), jnp.bfloat16)

    h = layernorm_ref(x, g, be)
    ref = (xla_ref(h, jnp.asarray(wq), jnp.asarray(ws), b).astype(jnp.float32)
           + res.astype(jnp.float32))
    got = int8_matmul(x, jnp.asarray(wq), jnp.asarray(ws), b,
                      ln_scale=g, ln_bias=be, residual=res, interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (m, n)
    e = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert e.max() / np.abs(np.asarray(ref, np.float32)).max() < 0.02


def test_int8_ff_geglu_fused_ln_and_residual():
    """Whole-FF kernel with pre-LN + residual == fallback composition
    (layernorm_ref -> quant GEGLU recipe -> quant dense -> residual add)."""
    import math

    from cfgpp_tpu.kernels.int8_matmul import int8_ff_geglu
    from cfgpp_tpu.models.quant import layernorm_ref
    rng = np.random.default_rng(11)
    m, k, n, o = 64, 320, 1280, 320
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    w1q, w1s = quantize_kernel_int8(rng.normal(0, 0.05, (k, 2 * n)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.1, (2 * n,)), jnp.float32)
    w2q, w2s = quantize_kernel_int8(rng.normal(0, 0.05, (n, o)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(0, 0.1, (o,)), jnp.float32)
    g = jnp.asarray(rng.normal(1, 0.1, (k,)), jnp.bfloat16)
    be = jnp.asarray(rng.normal(0, 0.1, (k,)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 1, (m, o)), jnp.bfloat16)

    hx = layernorm_ref(x, g, be)
    proj = np.asarray(xla_ref(hx, w1q, w1s, b1), np.float32)
    v, gg = proj[:, :n], proj[:, n:]
    h = v * (gg * 0.5 * (1.0 + np.vectorize(math.erf)(gg / np.sqrt(2.0))))
    hq, sh = quantize_activation_int8(jnp.asarray(h))
    acc = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    ref = (np.asarray(acc.astype(jnp.float32) * sh * w2s + b2)
           + np.asarray(res, np.float32))

    got = int8_ff_geglu(x, w1q, w1s, b1, w2q, w2s, b2,
                        ln_scale=g, ln_bias=be, residual=res, interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (m, o)
    e = np.abs(np.asarray(got, np.float32) - ref)
    assert e.max() / max(np.abs(ref).max(), 1e-6) < 0.03


def test_int8_matmul_fused_affine():
    """affine_scale/affine_bias [B, K] fusion == per-sample affine prologue
    -> recipe (the GroupNorm-collapse path for proj_in)."""
    rng = np.random.default_rng(13)
    b, t, k, n = 2, 64, 256, 512
    x = jnp.asarray(rng.normal(0, 1, (b, t, k)), jnp.bfloat16)
    wq, ws = quantize_kernel_int8(rng.normal(0, 0.05, (k, n)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)
    sa = jnp.asarray(rng.normal(1, 0.2, (b, k)), jnp.float32)
    ba = jnp.asarray(rng.normal(0, 0.3, (b, k)), jnp.float32)

    xn = (x.astype(jnp.float32) * sa[:, None, :] + ba[:, None, :])
    ref = xla_ref(xn.reshape(b * t, k), jnp.asarray(wq), jnp.asarray(ws), bias)
    got = int8_matmul(x, jnp.asarray(wq), jnp.asarray(ws), bias,
                      affine_scale=sa, affine_bias=ba, block_m=32,
                      interpret=True)
    assert got.shape == (b, t, n)
    e = np.abs(np.asarray(got, np.float32).reshape(b * t, n)
               - np.asarray(ref, np.float32))
    assert e.max() / np.abs(np.asarray(ref, np.float32)).max() < 0.02
