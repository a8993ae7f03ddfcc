"""Pallas flash-attention kernel tests (interpreter mode on CPU).

The kernel itself is exercised on real TPU by bench.py; here we verify the
blockwise-softmax math against the XLA einsum reference across shapes,
head-packing modes, block configurations, and the masked-kv padding path
(cross-attention kv=77, ragged q).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.kernels import flash_attention
from cfgpp_tpu.kernels.flash_attention import flash_attention_hd, heads_per_block
from cfgpp_tpu.models.attention import attention_hd, sdpa_xla


def rand_qkv(key, b, nq, nkv, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(key), 3)
    return (jax.random.normal(kq, (b, nq, h, d), dtype),
            jax.random.normal(kk, (b, nkv, h, d), dtype),
            jax.random.normal(kv, (b, nkv, h, d), dtype))


@pytest.mark.parametrize("nq,nkv,bq,bkv", [
    (512, 512, 512, 512),     # single block, packed heads (d=64 -> hpb=2)
    (1024, 1024, 256, 256),   # multi-block both dims
    (1024, 256, 256, 256),    # rectangular (q longer)
    (256, 1024, 256, 512),    # rectangular (kv longer)
    (1024, 1024, None, None), # auto block selection (single-pass path)
])
def test_flash_matches_xla(nq, nkv, bq, bkv):
    q, k, v = rand_qkv(0, 2, nq, nkv, 4, 64)
    out = flash_attention(q, k, v, block_q=bq, block_kv=bkv, interpret=True)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("h,d", [
    (8, 40),    # SD-1.5 level-0: full-channel-row packing (320 lanes)
    (8, 80),    # SD-1.5 level-1
    (1, 512),   # VAE single-head
    (20, 64),   # SDXL level-2: two heads per 128-lane block
])
def test_flash_head_packing_modes(h, d):
    q, k, v = rand_qkv(7, 1, 256, 256, h, d)
    out = flash_attention(q, k, v, interpret=True)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_heads_per_block_rules():
    assert heads_per_block(20, 64) == 2    # 128-lane pair
    assert heads_per_block(10, 64) == 2
    assert heads_per_block(1, 512) == 1     # d already lane-aligned
    assert heads_per_block(8, 40) == 8      # full channel row
    assert heads_per_block(8, 160) == 8    # full channel row


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


def test_flash_cross_attention_kv77():
    """kv=77 pads to the 128-lane tile; padded columns must be masked out."""
    q, _, _ = rand_qkv(4, 2, 1024, 1024, 4, 64)
    _, k, v = rand_qkv(5, 2, 77, 77, 4, 64)
    out = flash_attention(q, k, v, interpret=True)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_masked_kv_multiblock():
    """Ragged kv across multiple kv blocks (mask on the trailing block)."""
    q, _, _ = rand_qkv(8, 1, 256, 256, 2, 64)
    _, k, v = rand_qkv(9, 1, 300, 300, 2, 64)
    out = flash_attention(q, k, v, block_q=256, block_kv=128, interpret=True)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_ragged_q_padded():
    """Non-divisible q lengths are zero-padded and sliced back."""
    q, k, v = rand_qkv(3, 1, 1500, 512, 1, 64)
    out = flash_attention(q, k, v, interpret=True)
    ref = sdpa_xla(q, k, v)
    assert out.shape == (1, 1500, 1, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_hd_einsum_fallback_matches():
    """Token-major entry point: CPU fallback must equal the 4D einsum path."""
    q, k, v = rand_qkv(6, 2, 128, 77, 4, 32)
    b, n, h, d = q.shape
    out = attention_hd(q.reshape(b, n, h * d), k.reshape(b, 77, h * d),
                       v.reshape(b, 77, h * d), num_heads=h)
    ref = sdpa_xla(q, k, v).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_hd_flash_matches_einsum():
    q, k, v = rand_qkv(10, 1, 512, 512, 4, 64)
    b, n, h, d = q.shape
    out = attention_hd(q.reshape(b, n, h * d), k.reshape(b, n, h * d),
                       v.reshape(b, n, h * d), num_heads=h, force_impl="xla")
    out2 = flash_attention_hd(q.reshape(b, n, h * d), k.reshape(b, n, h * d),
                              v.reshape(b, n, h * d), h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-5)


@pytest.mark.parametrize("nq,bq,bkv,h,d", [
    (512, 512, 512, 4, 64),    # single-pass kernel, packed heads
    (1024, 256, 256, 4, 64),   # multi-block running softmax
    (256, 256, 256, 8, 40),    # d=40: lane-rule split-pack fallback (SD-1.5 level-0)
    (256, 256, 256, 20, 64),   # SDXL level-2 head count
])
def test_flash_qkv_packed_matches_xla(nq, bq, bkv, h, d):
    """Packed [B,N,3HD] self-attention: channel-offset q/k/v views + the
    in-kernel softmax scale must equal the plain einsum reference."""
    from cfgpp_tpu.kernels.flash_attention import flash_attention_qkv_packed
    q, k, v = rand_qkv(11, 2, nq, nq, h, d)
    b = q.shape[0]
    qkv = jnp.concatenate([t.reshape(b, nq, h * d) for t in (q, k, v)], axis=-1)
    out = flash_attention_qkv_packed(qkv, h, block_q=bq, block_kv=bkv,
                                     interpret=True)
    ref = sdpa_xla(q, k, v).reshape(b, nq, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_views_lane_rule():
    """Mosaic requires a BlockSpec's last-dim block to be a 128-multiple or
    the full array dim.  The packed-qkv channel views can never equal the
    3*H*D array dim, so the packed kernels must only be entered when
    hpb*d % 128 == 0 — found the hard way: the sd15_int8 op-point (d=40,
    ld=320 views of a 960-wide pack) crashed TPU lowering while every CPU
    interpret-mode test passed.  Asserts the predicate over every
    self-attention site of both families, and that the d=40 packed entry
    points (which now split the pack and route to the contiguous-array
    kernels) still match the einsum reference."""
    from cfgpp_tpu.kernels.flash_attention import (
        flash_attention_qkv_packed_int8, packed_views_legal)

    # SDXL: d=64 at 10 and 20 heads -> ld=128, legal
    assert packed_views_legal(10, 64)
    assert packed_views_legal(20, 64)
    # SD-1.5: 8 heads of d=40/80/160; only d=80 (ld=640) is lane-aligned
    assert not packed_views_legal(8, 40)
    assert packed_views_legal(8, 80)
    assert packed_views_legal(8, 160)

    q, k, v = rand_qkv(13, 2, 256, 256, 8, 40)
    b, n, h, d = q.shape
    qkv = jnp.concatenate([t.reshape(b, n, h * d) for t in (q, k, v)], axis=-1)
    ref = sdpa_xla(q, k, v).reshape(b, n, h * d)
    got = np.asarray(flash_attention_qkv_packed_int8(qkv, h, interpret=True),
                     np.float32)
    assert np.mean(np.abs(got - np.asarray(ref, np.float32))) < 2e-2


def test_attention_qkv_packed_fallback_matches():
    """Short-sequence einsum fallback of the packed entry point."""
    from cfgpp_tpu.models.attention import attention_qkv_packed
    q, k, v = rand_qkv(12, 2, 128, 128, 4, 32)
    b, n, h, d = q.shape
    qkv = jnp.concatenate([t.reshape(b, n, h * d) for t in (q, k, v)], axis=-1)
    out = attention_qkv_packed(qkv, h)
    ref = sdpa_xla(q, k, v).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_prepadded_kv_len():
    """Pre-padded k/v (the UNet pads the 77-token context once) + explicit
    kv_len must equal attention over the unpadded k/v."""
    b, nq, nkv, h, d = 2, 256, 77, 4, 64
    key = jax.random.PRNGKey(9)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nq, h * d), jnp.float32)
    k = jax.random.normal(kk, (b, nkv, h * d), jnp.float32)
    v = jax.random.normal(kv, (b, nkv, h * d), jnp.float32)
    kp = jnp.pad(k, ((0, 0), (0, 128 - nkv), (0, 0)))
    # poison the v padding rows: they must never contribute
    vp = jnp.pad(v, ((0, 0), (0, 128 - nkv), (0, 0)),
                 constant_values=1e3)
    ref = sdpa_xla(q.reshape(b, nq, h, d), k.reshape(b, nkv, h, d),
                   v.reshape(b, nkv, h, d)).reshape(b, nq, h * d)
    got = flash_attention_hd(q, kp, vp, h, kv_len=nkv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # the einsum dispatch path slices instead of masking
    got2 = attention_hd(q, kp, vp, h, kv_len=nkv, force_impl="xla")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("nq,nkv,kv_pre_pad", [
    (1024, 1024, False),   # SDXL l2-self shape class
    (256, 77, True),       # cross-attn with pre-padded kv
])
def test_flash_int8_close_to_exact(nq, nkv, kv_pre_pad):
    """Int8-MXU attention must track the exact softmax within the W8A8
    error budget (~1% relative on N(0,1) inputs)."""
    from cfgpp_tpu.kernels.flash_attention import flash_attention_hd_int8
    b, h, d = 2, 4, 64
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nq, h * d), jnp.float32)
    k = jax.random.normal(kk, (b, nkv, h * d), jnp.float32)
    v = jax.random.normal(kv, (b, nkv, h * d), jnp.float32)
    ref = np.asarray(sdpa_xla(q.reshape(b, nq, h, d), k.reshape(b, nkv, h, d),
                              v.reshape(b, nkv, h, d))).reshape(b, nq, h * d)
    if kv_pre_pad:
        pad = 128 - nkv
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)), constant_values=7.0)
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)), constant_values=7.0)
        got = flash_attention_hd_int8(q, k, v, h, kv_len=nkv, interpret=True)
    else:
        got = flash_attention_hd_int8(q, k, v, h, interpret=True)
    g = np.asarray(got, np.float32)
    err = np.abs(g - ref)
    rel = err.max() / np.abs(ref).max()
    assert rel < 0.03, rel
    # scalar per-(head, block) k scale: ~1.2-1.6% mean rel on N(0,1)
    # inputs (vs ~0.6% for per-row k scales; the in-kernel quantize costs
    # zero extra HBM passes in exchange — kernel docstring)
    assert np.abs(g - ref).mean() / np.abs(ref).mean() < 0.02


def test_flash_qkv_packed_int8_close():
    from cfgpp_tpu.kernels.flash_attention import flash_attention_qkv_packed_int8
    b, n, h, d = 2, 512, 4, 64
    qkv = jax.random.normal(jax.random.PRNGKey(5), (b, n, 3 * h * d),
                            jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = np.asarray(sdpa_xla(q.reshape(b, n, h, d), k.reshape(b, n, h, d),
                              v.reshape(b, n, h, d))).reshape(b, n, h * d)
    got = np.asarray(flash_attention_qkv_packed_int8(qkv, h, interpret=True),
                     np.float32)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.03
    assert np.abs(got - ref).mean() / np.abs(ref).mean() < 0.02
