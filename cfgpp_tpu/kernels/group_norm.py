"""Pallas TPU GroupNorm kernels (+ optional SiLU, + optional fused bias add).

Library primitives in NHWC channel-last layout; the UNet/VAE deliberately
keep `nn.GroupNorm`.  Both forms were integrated and measured on v5e
(SDXL 1024^2 step, baseline 114 ms of device ops) and both LOST:

* **`group_norm_pallas` (fully fused)**: stats + normalize + SiLU in two
  kernel passes — 140 ms/step.  XLA fuses each GroupNorm's normalize+SiLU
  into the consumer conv's input read for free; the kernel forces the
  normalized tensor to materialize.
* **`group_norm_hybrid`**: Pallas *statistics only* (`group_norm_stats`:
  one streaming read -> [B, 2, G] mean/rstd) + jnp normalize that fuses
  into the consumer — 142 ms/step.  The kernel itself was fast, but XLA's
  layout assignment around the interleaved custom calls abandoned its
  spatially-blocked convolution layouts (top conv: 1.66 -> 4.04 ms in an
  unblocked T(2,128) form).  Same failure mode as the LayerNorm variants
  (kernels/layer_norm.py).

Recorded so the experiment is not repeated; the kernels remain for graphs
without XLA's conv-layout sensitivity.  Structure of the fully fused form:

* **Pass 1 (stats)**: per-channel f32 [sum, sum^2] accumulated across row
  blocks (the grid's trailing dimension revisits one VMEM-resident [2, C]
  block, so partial sums never round-trip HBM).
* **Pass 2 (apply)**: channels->groups reduction via a one-hot [C, G]
  matmul on the MXU (no awkward lane-dim reshapes), then
  ``(x - mean) * rsqrt(var + eps) * gamma + beta`` and the following SiLU
  fused into the single output write.
* **Fused bias add**: the UNet resnet's ``h + time_emb[:, None, None, :]``
  immediately precedes its norm2.  Elementwise producers cannot fuse into
  an opaque custom call, so without kernel support XLA materializes
  ``h + t`` as an extra read+write of the full tensor; passing ``add``
  ([B, C]) folds it into both passes for free (VPU add on VMEM blocks).

Total traffic is 2 reads + 1 write of the activation; the fp32 statistics
match Flax's ``GroupNorm`` (E[x^2] - E[x]^2 in fp32), verified in
tests/test_group_norm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfgpp_tpu.kernels.common import pick_row_block as _pick_rows


def _read_x(x_ref, t_ref):
    xf = x_ref[0].astype(jnp.float32)
    if t_ref is not None:
        xf = xf + t_ref[0].astype(jnp.float32)          # [1, C] broadcast
    return xf


def _stats_kernel(x_ref, out_ref):
    _stats_body(x_ref, None, out_ref)


def _stats_kernel_add(x_ref, t_ref, out_ref):
    _stats_body(x_ref, t_ref, out_ref)


def _stats_body(x_ref, t_ref, out_ref):
    j = pl.program_id(1)
    xf = _read_x(x_ref, t_ref)
    s = jnp.sum(xf, axis=0, keepdims=True)
    q = jnp.sum(xf * xf, axis=0, keepdims=True)
    partial = jnp.concatenate([s, q], axis=0)           # [2, C]

    @pl.when(j == 0)
    def _init():
        out_ref[0] = partial

    @pl.when(j > 0)
    def _acc():
        out_ref[0] = out_ref[0] + partial


def _apply_kernel(x_ref, s_ref, g_ref, b_ref, o_ref, *, groups, n_rows, eps, act):
    _apply_body(x_ref, None, s_ref, g_ref, b_ref, o_ref, groups=groups,
                n_rows=n_rows, eps=eps, act=act)


def _apply_kernel_add(x_ref, t_ref, s_ref, g_ref, b_ref, o_ref, *,
                      groups, n_rows, eps, act):
    _apply_body(x_ref, t_ref, s_ref, g_ref, b_ref, o_ref, groups=groups,
                n_rows=n_rows, eps=eps, act=act)


def _apply_body(x_ref, t_ref, s_ref, g_ref, b_ref, o_ref, *,
                groups: int, n_rows: int, eps: float, act: str | None):
    c = x_ref.shape[-1]
    cpg = c // groups
    sums = s_ref[0]                                      # [2, C] f32

    # channels -> groups with a one-hot [C, G] matmul: MXU-friendly, no
    # lane-dimension reshapes (cpg is 10..80, never a tile multiple).
    # HIGHEST precision: the default TPU dot rounds f32 operands to bf16,
    # which would put a ~3e-3 relative error on every mean/rstd.
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (cid // cpg == gid).astype(jnp.float32)
    gsum = jax.lax.dot_general(sums, onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # [2, G]

    n = jnp.float32(n_rows * cpg)
    mean = gsum[0:1] / n                                 # [1, G]
    var = jnp.maximum(gsum[1:2] / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mv = jnp.concatenate([mean, rstd], axis=0)           # [2, G]
    # groups -> channels through the same one-hot (contraction on G)
    ch = jax.lax.dot_general(mv, onehot, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)   # [2, C]

    scale = g_ref[:].astype(jnp.float32) * ch[1:2]       # gamma * rstd  [1, C]
    shift = b_ref[:].astype(jnp.float32) - ch[0:1] * scale

    y = _read_x(x_ref, t_ref) * scale + shift
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _stats_final_kernel(x_ref, o_ref, acc, *, groups, n_rows, eps):
    _stats_final_body(x_ref, None, o_ref, acc, groups=groups,
                      n_rows=n_rows, eps=eps)


def _stats_final_kernel_add(x_ref, t_ref, o_ref, acc, *, groups, n_rows, eps):
    _stats_final_body(x_ref, t_ref, o_ref, acc, groups=groups,
                      n_rows=n_rows, eps=eps)


def _stats_final_body(x_ref, t_ref, o_ref, acc, *,
                      groups: int, n_rows: int, eps: float):
    """Accumulate [2, C] sums in VMEM scratch; on the last row block reduce
    channels->groups and emit [2, G] (mean, rstd) — the only HBM output."""
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    xf = _read_x(x_ref, t_ref)
    s = jnp.sum(xf, axis=0, keepdims=True)
    q = jnp.sum(xf * xf, axis=0, keepdims=True)
    partial = jnp.concatenate([s, q], axis=0)            # [2, C]

    @pl.when(j == 0)
    def _init():
        acc[:] = partial

    @pl.when(j > 0)
    def _acc():
        acc[:] = acc[:] + partial

    @pl.when(j == nb - 1)
    def _finalize():
        c = x_ref.shape[-1]
        cpg = c // groups
        cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        onehot = (cid // cpg == gid).astype(jnp.float32)
        gsum = jax.lax.dot_general(acc[:], onehot, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        n = jnp.float32(n_rows * cpg)
        mean = gsum[0:1] / n
        var = jnp.maximum(gsum[1:2] / n - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        o_ref[0] = jnp.concatenate([mean, rstd], axis=0)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def group_norm_stats(x: jnp.ndarray, groups: int, eps: float = 1e-5,
                     add: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """One streaming bf16/f32 read of x: [B, N, C] -> f32 [B, 2, G]
    (mean, rstd) per (batch, group).  The caller applies the normalize in
    plain jnp so XLA fuses it into the consumer — this kernel only replaces
    XLA's statistics chain, which materializes full f32 copies of x and
    x^2 before reducing (measured: the chain moves ~5x the tensor bytes).
    ``add`` ([B, C]) enters the statistics as x + add."""
    b, n, c = x.shape
    bn = _pick_rows(n, c, x.dtype.itemsize)
    nb = n // bn
    x_spec = pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0))
    t_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    if add is not None:
        kern = functools.partial(_stats_final_kernel_add, groups=groups,
                                 n_rows=n, eps=eps)
        in_specs, args = [x_spec, t_spec], (x, add.reshape(b, 1, c).astype(x.dtype))
    else:
        kern = functools.partial(_stats_final_kernel, groups=groups,
                                 n_rows=n, eps=eps)
        in_specs, args = [x_spec], (x,)
    return pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, groups), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act", "interpret"))
def group_norm_pallas(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                      groups: int, eps: float = 1e-5,
                      act: str | None = None,
                      add: jnp.ndarray | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """x: [B, N, C] (token-major NHWC view); gamma/beta: [C]; add: [B, C]."""
    b, n, c = x.shape
    bn = _pick_rows(n, c, x.dtype.itemsize)
    nb = n // bn
    grid = (b, nb)
    x_spec = pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0))
    t_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    s_spec = pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0))
    v_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0))
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))

    if add is not None:
        add3 = add.reshape(b, 1, c).astype(x.dtype)
        stats_in, stats_args = [x_spec, t_spec], (x, add3)
        stats_kern = _stats_kernel_add
    else:
        stats_in, stats_args = [x_spec], (x,)
        stats_kern = _stats_kernel

    stats = pl.pallas_call(
        stats_kern,
        grid=grid,
        in_specs=stats_in,
        out_specs=s_spec,
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(*stats_args)

    gb = (gamma.reshape(1, c), beta.reshape(1, c))
    if add is not None:
        kern = functools.partial(_apply_kernel_add, groups=groups, n_rows=n,
                                 eps=eps, act=act)
        in_specs = [x_spec, t_spec, s_spec, v_spec, v_spec]
        args = (x, add3, stats) + gb
    else:
        kern = functools.partial(_apply_kernel, groups=groups, n_rows=n,
                                 eps=eps, act=act)
        in_specs = [x_spec, s_spec, v_spec, v_spec]
        args = (x, stats) + gb
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        compiler_params=params,
        interpret=interpret,
    )(*args)


def group_norm_xla(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   groups: int, eps: float = 1e-5,
                   act: str | None = None,
                   add: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference path (any backend): fp32 stats, same formula."""
    b, n, c = x.shape
    xf = x.astype(jnp.float32)
    if add is not None:
        xf = xf + add.astype(jnp.float32)[:, None, :]
    xf = xf.reshape(b, n, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, n, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm_hybrid(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                      groups: int, eps: float = 1e-5,
                      act: str | None = None,
                      add: jnp.ndarray | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Pallas statistics + jnp normalize: the fastest in-model form.

    The normalize (x*scale + shift, SiLU) stays in XLA, which fuses it into
    the consumer's input read (a conv epilogue costs nothing); only the
    statistics — where XLA materializes f32 x/x^2 copies — run as a kernel.
    """
    b, n, c = x.shape
    cpg = c // groups
    stats = group_norm_stats(x, groups, eps, add=add, interpret=interpret)
    mean = jnp.repeat(stats[:, 0], cpg, axis=-1)         # [B, C]
    rstd = jnp.repeat(stats[:, 1], cpg, axis=-1)
    scale = gamma.astype(jnp.float32) * rstd
    shift = beta.astype(jnp.float32) - mean * scale
    xf = x.astype(jnp.float32)
    if add is not None:
        xf = xf + add.astype(jnp.float32)[:, None, :]
    y = xf * scale[:, None, :] + shift[:, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def group_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               groups: int, eps: float = 1e-5,
               act: str | None = None,
               add: jnp.ndarray | None = None) -> jnp.ndarray:
    """GroupNorm(+SiLU) on token-major [B, N, C]; on TPU the statistics run
    as a Pallas kernel and the normalize fuses into the consumer (hybrid),
    elsewhere pure XLA.  ``add`` ([B, C]) is added to x before the
    statistics (the resnet time-embedding bias)."""
    b, n, c = x.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or c % groups or n % 8 or n < 8:
        return group_norm_xla(x, gamma, beta, groups, eps, act, add)
    return group_norm_hybrid(x, gamma, beta, groups, eps, act, add)
