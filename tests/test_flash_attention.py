"""Pallas flash-attention kernel tests (interpreter mode on CPU).

The kernel itself is exercised on real TPU by bench.py; here we verify the
blockwise-softmax math against the XLA einsum reference across shapes and
block configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.kernels import flash_attention
from cfgpp_tpu.models.attention import sdpa, sdpa_xla


def rand_qkv(key, b, nq, nkv, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(key), 3)
    return (jax.random.normal(kq, (b, nq, h, d), dtype),
            jax.random.normal(kk, (b, nkv, h, d), dtype),
            jax.random.normal(kv, (b, nkv, h, d), dtype))


@pytest.mark.parametrize("nq,nkv,bq,bkv", [
    (512, 512, 512, 512),     # single block
    (1024, 1024, 256, 256),   # multi-block both dims
    (1024, 256, 256, 256),    # rectangular (q longer)
    (256, 1024, 256, 512),    # rectangular (kv longer)
])
def test_flash_matches_xla(nq, nkv, bq, bkv):
    q, k, v = rand_qkv(0, 2, nq, nkv, 4, 64)
    out = flash_attention(q, k, v, block_q=bq, block_kv=bkv, interpret=True)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    q, k, v = rand_qkv(1, 1, 512, 512, 2, 64, jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = sdpa_xla(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=2e-2)


def test_flash_extreme_logits_stable():
    """Running-max rescaling must survive large score magnitudes."""
    q, k, v = rand_qkv(2, 1, 512, 512, 1, 64)
    q = q * 30.0
    out = flash_attention(q, k, v, block_q=256, block_kv=128, interpret=True)
    ref = sdpa_xla(q, k, v)
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flash_ragged_rejected():
    q, k, v = rand_qkv(3, 1, 2048, 512, 1, 64)
    # 1500 doesn't tile by the (shrunken) default block and isn't a single
    # block -> explicit error rather than silent wrong output
    with pytest.raises(ValueError, match="tile"):
        flash_attention(q[:, :1500], k, v, interpret=True)
    # but a length equal to one block auto-shrinks and runs
    out = flash_attention(q[:, :500], k[:, :500], v[:, :500], interpret=True)
    assert out.shape == (1, 500, 1, 64)


def test_sdpa_dispatch_stays_on_xla_for_cross_attention():
    """kv=77 cross-attention must use the einsum path (no flash)."""
    q, _, _ = rand_qkv(4, 1, 4096, 4096, 2, 64)
    _, k, v = rand_qkv(5, 1, 4096, 77, 2, 64)
    out = sdpa(q, k[:, :77], v[:, :77])      # must not raise on CPU
    assert out.shape == (1, 4096, 2, 64)
