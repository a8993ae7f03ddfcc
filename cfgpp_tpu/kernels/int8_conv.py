"""Pallas TPU W8A8 fused 3x3 convolution (stride 1, zero pad 1, NHWC).

The UNet's resnet convs (`models/unet.py:ResnetBlock2D`, the hot conv at
/root/reference/latent_diffusion.py:152-155) are 24.4 ms of the 113.9 ms
SDXL batch-4 step.  v5e int8 MXU peak is 394 TOPS — 2x bf16 — but routing
W8A8 convs through XLA loses end-to-end: the per-sample absmax reduce, the
round/clip quantize write and the int32->f32 dequant each materialize as
separate f32-heavy HBM passes around the conv (measured round 2: --quant
all at 181.7 ms/step vs 113.9 bf16).

This kernel fuses the whole pipeline into the conv's natural tiling, the
same recipe `kernels/int8_matmul.py` proved on the dense projections:

  read a block of br image rows (+1 halo row each side, via three
  clamped-index BlockSpecs over the same HBM array)
  -> absmax over the window -> quantize to int8 once, in VMEM
  -> 3x3 conv as NINE shifted int8 MXU dots [br*W, C] x [C, bo] (int32 acc)
  -> dequant by (window_scale x per-channel w_scale) + bias
  -> write y bf16 [br, W, bo]

Activation scales are per (sample, row-window): FINER than the XLA path's
per-sample scale (models/quant.py:QuantConv) — a conv mixes pixels inside
its 3x3 window, so everything under one accumulation must share a scale,
and the br+2-row window is the smallest set this tiling accumulates over.
Weights are per-output-channel symmetric int8 ([3, 3, C, O] as quantized
offline by `quantize_conv_kernel_int8`).

Boundary handling: W is zero-padded in HBM before the call (zero rows
quantize to 0 and contribute 0, matching conv zero-padding); H boundaries
are handled in-kernel by zeroing the halo row when the block starts at
h==0 / ends at h==H-1 (halo BlockSpec indices are clamped, so those rows
otherwise hold neighbor-sample garbage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, xc_ref, xn_ref, w_ref, ws_ref, b_ref, o_ref,
            xq_s, sx_s, *, use_bias: bool, h_blocks: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    br = o_ref.shape[1]
    w_out = o_ref.shape[2]

    @pl.when(j == 0)
    def _quantize():
        # rows i*br-1 .. i*br+br of the padded image, quantized once per
        # row block; the int8 copy + scale stay in VMEM/SMEM scratch for
        # every output-channel block (j is the sequential grid dim)
        xf = jnp.concatenate(
            [xp_ref[0, br - 1:br], xc_ref[0], xn_ref[0, 0:1]],
            axis=0).astype(jnp.float32)                   # [br+2, Wp, C]
        first = (i % h_blocks) == 0                       # block starts at h==0
        last = ((i + 1) % h_blocks) == 0                  # block ends at h==H-1
        rows = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)
        valid = jnp.logical_and(
            jnp.logical_or(jnp.logical_not(first), rows > 0),
            jnp.logical_or(jnp.logical_not(last), rows < br + 1))
        xf = jnp.where(valid, xf, 0.0)
        amax = jnp.max(jnp.abs(xf))
        sx = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
        sx_s[0, 0] = sx
        # NOTE: pl.reciprocal rejects scalar operands in this Mosaic build
        # (F32Type has no element_type) — plain division lowers fine.
        xq_s[:] = jnp.clip(jnp.round(xf * (1.0 / sx)),
                           -127.0, 127.0).astype(jnp.int8)

    c = xq_s.shape[-1]
    bo = o_ref.shape[-1]
    acc = jnp.zeros((br * w_out, bo), jnp.int32)
    for dh in range(3):
        for dw in range(3):
            xs = xq_s[dh:dh + br, dw:dw + w_out, :].reshape(br * w_out, c)
            acc += jax.lax.dot_general(
                xs, w_ref[dh, dw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx_s[0, 0] * ws_ref[:]  # rank-1 dequant
    if use_bias:
        y = y + b_ref[:]
    o_ref[0] = y.reshape(br, w_out, bo).astype(o_ref.dtype)


# VMEM ceiling for block selection; the axon build caps the Pallas scoped
# stack at 16MB and the quantize stage makes a transient f32 window copy.
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_est(br: int, wp: int, c: int, bo: int) -> int:
    wrow = br * wp * c
    return (wrow * 2 * 3 * 2      # 3 bf16 halo views, double-buffered
            + (br + 2) * wp * c   # int8 scratch window
            + (br + 2) * wp * c * 4   # f32 quantize transient
            + 9 * c * bo * 2      # w int8 block, double-buffered
            + br * wp * bo * 2 * 2    # out bf16, double-buffered
            + br * wp * bo * 8)   # int32 acc + f32 dequant transients


def _pick_blocks(h: int, w: int, c: int, o: int):
    # bo: Mosaic wants the lane (last) block dim to be a multiple of 128 or
    # the whole array dim; it must also divide o (the kernel writes no
    # partial blocks).  br must divide h so a row block never spans samples.
    bo_opts = [b for b in (1280, 1024, 768, 640, 512, 384, 256, 128)
               if b <= o and o % b == 0] or [o]
    br_opts = [b for b in (32, 16, 8, 4, 2, 1) if h % b == 0]
    for br in br_opts:
        if br * w > 1024:     # MXU saturates near M=512; bigger wastes VMEM
            continue
        for bo in bo_opts:
            if _vmem_est(br, w + 2, c, bo) <= _VMEM_BUDGET:
                return br, bo
    return br_opts[-1], bo_opts[-1]


def int8_conv3x3_supported(x_shape, strides, padding) -> bool:
    """True when `int8_conv3x3` handles this conv (stride 1, pad 1, and a
    spatial extent big enough that the fused kernel beats XLA)."""
    b, h, w, c = x_shape
    if strides not in ((1, 1), None):
        return False
    if padding not in (1, ((1, 1), (1, 1))):
        return False
    return h >= 8 and w >= 8 and c >= 128


@functools.partial(jax.jit, static_argnames=("block_rows", "block_o", "interpret"))
def int8_conv3x3(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                 bias: jnp.ndarray | None = None,
                 block_rows: int | None = None, block_o: int | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """x bf16/f32 NHWC [B,H,W,C] * w_q int8 [3,3,C,O] (per-channel f32
    w_scale [O]) -> bf16 [B,H,W,O]; stride 1, zero padding 1.

    Per-row-window dynamic activation quantization happens inside the
    kernel (see module docstring for the scale granularity argument).
    """
    b, h, w, c = x.shape
    kh, kw, wc, o = w_q.shape
    if (kh, kw) != (3, 3) or wc != c:
        raise ValueError(f"int8_conv3x3 needs [3,3,{c},O] weights, got {w_q.shape}")

    br, bo = (block_rows, block_o) if block_rows and block_o \
        else _pick_blocks(h, w, c, o)
    if h % br != 0:
        raise ValueError(f"block_rows={br} must divide H={h}")
    if o % bo != 0:
        raise ValueError(f"block_o={bo} must divide O={o} (no partial blocks)")

    wp = w + 2
    xpad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))   # zero-pad W in HBM
    rows = b * h
    nb = rows // br
    x4 = xpad.reshape(nb, br, wp, c)

    h_blocks = h // br
    grid = (nb, o // bo)
    use_bias = bias is not None
    args = [x4, x4, x4, w_q, w_scale.astype(jnp.float32).reshape(1, o)]
    in_specs = [
        pl.BlockSpec((1, br, wp, c), lambda i, j: (jnp.maximum(i - 1, 0), 0, 0, 0)),
        pl.BlockSpec((1, br, wp, c), lambda i, j: (i, 0, 0, 0)),
        pl.BlockSpec((1, br, wp, c),
                     lambda i, j, _nb=nb: (jnp.minimum(i + 1, _nb - 1), 0, 0, 0)),
        pl.BlockSpec((3, 3, c, bo), lambda i, j: (0, 0, 0, j)),
        pl.BlockSpec((1, bo), lambda i, j: (0, j)),
    ]
    if use_bias:
        args.append(bias.astype(jnp.float32).reshape(1, o))
        in_specs.append(pl.BlockSpec((1, bo), lambda i, j: (0, j)))
    else:
        args.append(jnp.zeros((1, 1), jnp.float32))
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, use_bias=use_bias, h_blocks=h_blocks),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, br, w, bo), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((nb, br, w, o), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((br + 2, wp, c), jnp.int8),
                        pltpu.SMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, w, o)


def int8_conv3x3_reference(x, w_q, w_scale, bias=None, block_rows=None):
    """Pure-jnp oracle replicating the kernel's exact recipe — per-(sample,
    row-window) scale, int32 accumulation — for bitwise comparison in tests
    (an f32 conv oracle would NOT be exact: int8 products at C>=128 exceed
    the f32 mantissa)."""
    b, h, w, c = x.shape
    o = w_q.shape[-1]
    br = block_rows or _pick_blocks(h, w, c, o)[0]
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (1, 1), (0, 0)))
    wq = w_q.astype(jnp.int32)
    zero_row = jnp.zeros((w + 2, c), jnp.float32)
    outs = []
    for r0 in range(0, b * h, br):
        bi, h0 = divmod(r0, h)
        win = jnp.stack([xf[bi, hh] if 0 <= hh < h else zero_row
                         for hh in range(h0 - 1, h0 + br + 1)])  # [br+2,Wp,C]
        sx = jnp.maximum(jnp.max(jnp.abs(win)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(win / sx), -127.0, 127.0).astype(jnp.int32)
        acc = jnp.zeros((br, w, o), jnp.int32)
        for dh in range(3):
            for dw in range(3):
                acc += jnp.einsum("rwc,co->rwo", xq[dh:dh + br, dw:dw + w],
                                  wq[dh, dw])
        y = acc.astype(jnp.float32) * sx * w_scale.astype(jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        outs.append(y)
    return jnp.stack(outs).reshape(b, h, w, o).astype(jnp.bfloat16)
