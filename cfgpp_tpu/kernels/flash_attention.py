"""Pallas TPU flash attention (non-causal), head-packed native layout.

Blockwise softmax-attention with O(N) memory: the custom-kernel surface of
this workload (SURVEY.md §2.4), replacing PyTorch SDPA / AttnProcessor2_0
inside the reference's diffusers UNet (`latent_sdxl.py:7-10`).

Design notes (all measured on TPU v5e):

* **Native [B, N, H*D] layout.**  The q/k/v projections produce
  token-major ``[B, N, H*D]`` activations; transposing to the classic
  ``[B*H, N, D]`` kernel layout costs 4 full HBM round-trips per attention
  site (~5 ms/step across SDXL's 70 sites).  Instead the kernel blocks the
  *channel* dimension: each grid step covers ``hpb`` heads (128 lanes for
  D=64) and loops them in VMEM, so qkv/out never leave token-major layout
  and XLA elides every transpose.
* **Pre-scaled q in log2 space.**  ``q * (D^-1/2 * log2(e))`` is applied
  outside the kernel (it fuses into the projection epilogue) and softmax
  runs on ``exp2``: both remove full [bq, bkv] f32 VPU passes.  The kernel
  is VPU-bound, not MXU-bound — at D=64 the MXU tops out at ~98 TF/s
  (contraction depth 64 = half the 128-wide systolic array), and cutting
  VPU work moved N=4096 from 72 to 82.5 TF/s.
* **Single-pass specialization.**  When the whole kv sequence fits one
  block there is no running max/sum to carry: a dedicated kernel skips the
  scratch init, alpha rescale and accumulator read-modify-write
  (N=1024: 161 -> 132 us).
* **Masked kv padding.**  kv is padded to the lane tile and masked with an
  iota compare, which admits cross-attention (kv=77) and any ragged N —
  the einsum path's f32 [B,H,N,77] logits (plus their HBM traffic)
  disappear into the kernel.  ``kv_len`` lets the caller pre-pad k/v once
  (the UNet pads the 77-token context per forward, not per site).
* **Block-size ceiling (measured, do not re-sweep).**  With the Mosaic
  VMEM window raised to 64MB, larger q blocks at the SDXL shapes change
  nothing: l1-self [8,4096,640] bq 256(auto)/512 both 83 TF/s, bq=1024
  81, bq=2048 69, bq=4096 fails to compile; l2-self [8,1024,1280]
  flat at 69-70 TF/s for bq 512-1024 (sweep 2026-08-17).  The kernel is
  VPU-bound on top of an MXU running at 50% duty at D=64 (64-deep
  contraction on the 128-wide array), so ~83 of the ~98 TF/s practical
  ceiling is what block tuning can reach; the round-4 levers were
  therefore algorithmic, removing whole [bq, bkv] VPU passes: the max
  pass is dropped in the single-pass kernels (`_softmax_pv` — a
  one-block softmax needs no range shift), and the sum pass rides the
  p@v MXU dot at bkv >= 2048 (`_build_v_aug`).  What remains per block
  is exp2 + the bf16 convert (and for the int8-score variant the
  in-kernel q/k quantize) — irreducible for a softmax kernel.

Reference hot-path: `latent_diffusion.py:152-155` (the batch-2 UNet call
whose attention layers this kernel serves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634
# VMEM budget for block-size selection (bytes); Mosaic's default scoped
# window is 16MB but the chip physically has far more (the int8 FF kernel
# runs with a 64MB window) — raise the ceiling and let the block picker
# use it.  _VMEM_LIMIT is what we ask Mosaic for; _VMEM_BUDGET is the
# picker's self-imposed cap (headroom for double-buffering).
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 13 * 1024 * 1024

from cfgpp_tpu.kernels.common import cdiv as _cdiv  # noqa: E402


def _build_v_aug(v_ref, va_s, d):
    """Fill the sum-augmentation scratch for the d=64 / hpb=2 layout.

    ``va_s[j]`` is head j's value block kept in its native channel half of
    the 128-lane tile, with a 1.0 column dropped into the OTHER half
    (col d for head 0, col 0 for head 1).  The ``p @ va_s[j]`` MXU dot
    then produces BOTH p@v (the head's 64 columns) and the softmax row sum
    l (the ones column) in one pass — the 64-wide pv dot already wastes
    half its 128 output lanes, so the l column rides for free and the
    separate [bq, bkv] VPU sum pass disappears.  Built once per (batch,
    head-pair) grid row (`pl.when(iq == 0)`), amortized over all q blocks.
    """
    # f32 working set: Mosaic cannot relayout the (8,128)-tiled i1 iota
    # masks onto (16,128)-tiled bf16 vectors ("Invalid relayout" at
    # compile); the f32 selects + one cast run once per (batch, head-pair)
    vb = v_ref[0].astype(jnp.float32)           # [bkv, 128]: v0 | v1
    col = jax.lax.broadcasted_iota(jnp.int32, vb.shape, 1)
    one = jnp.ones_like(vb)
    zero = jnp.zeros_like(vb)
    dt = v_ref.dtype
    va_s[0] = jnp.where(col < d, vb, jnp.where(col == d, one, zero)).astype(dt)
    va_s[1] = jnp.where(col >= d, vb, jnp.where(col == 0, one, zero)).astype(dt)


def _pv_sum_mxu(p, va_s, j, d, o_ref):
    """p @ v and the row sum l in one augmented MXU dot; write o = pv/l."""
    u = jax.lax.dot_general(p, va_s[j], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if j == 0:
        o_ref[0, :, 0:d] = (u[:, 0:d] / u[:, d:d + 1]).astype(o_ref.dtype)
    else:
        o_ref[0, :, d:2 * d] = (u[:, d:2 * d] / u[:, 0:1]).astype(o_ref.dtype)


def _maxfree_enabled() -> bool:
    import os
    return os.environ.get("CFGPP_NO_MAXFREE") != "1"


def _softmax_pv(s, j, d, v_ref, o_ref, sum_mxu, va_s, maxfree):
    """Single-pass softmax tail: p = exp2(s [- max]), then o = (p@v)/sum(p).

    ``maxfree``: for a ONE-block softmax the max subtraction is a pure fp
    rescaling — exp2(s-m)/Σexp2(s-m) == exp2(s)/Σexp2(s) exactly in real
    arithmetic — kept in streaming kernels only because the running carry
    needs a bounded range.  SD/SDXL logits sit at |s| <~ 30-50 after the
    folded 1/sqrt(d)*log2e scale, far inside the f32/bf16 exp2 range
    (overflow at 2^127), so the [bq, bkv] max-reduce + subtract VPU pass
    is dropped from this VPU-bound kernel.  Masked lanes (NEG_INF)
    underflow to exactly 0; ``l`` floors at 1e-37 so the all-underflow
    corner (max logit < -127 — impossible for LN'd activations) degrades
    to a zero output instead of NaN.  CFGPP_NO_MAXFREE=1 restores the
    max-subtracted path (read at trace time, same A/B contract as
    CFGPP_NO_KV_CACHE / CFGPP_NO_SUM_MXU).
    """
    if maxfree:
        p = jnp.exp2(s)
    else:
        p = jnp.exp2(s - jnp.max(s, axis=1, keepdims=True))
    p = p.astype(v_ref.dtype)
    if sum_mxu:
        u = jax.lax.dot_general(p, va_s[j], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if j == 0:
            l = jnp.maximum(u[:, d:d + 1], 1e-37)
            o_ref[0, :, 0:d] = (u[:, 0:d] / l).astype(o_ref.dtype)
        else:
            l = jnp.maximum(u[:, 0:1], 1e-37)
            o_ref[0, :, d:2 * d] = (u[:, d:2 * d] / l).astype(o_ref.dtype)
        return
    v = v_ref[0, :, j * d:(j + 1) * d]
    l = jnp.maximum(
        jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True), 1e-37)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, :, j * d:(j + 1) * d] = (pv / l).astype(o_ref.dtype)


def _kernel_single(q_ref, k_ref, v_ref, o_ref, *maybe_va, kv_len, bkv, d, hpb,
                   q_scale=None, maxfree=True):
    """One kv block covers the whole sequence: plain (not running) softmax.

    The kernel is VPU-bound, so its levers drop [bq, bkv] VPU passes
    (mask-free self-attention runs max, exp2, sum): ``maxfree`` removes
    the max pass (see `_softmax_pv`), the optional ``va_s`` scratch
    (d=64/hpb=2, bkv >= 2048) moves the sum onto the p@v MXU dot
    (`_build_v_aug`)."""
    sum_mxu = bool(maybe_va)
    va_s = None
    if sum_mxu:
        va_s = maybe_va[0]

        @pl.when(pl.program_id(1) == 0)
        def _build():
            _build_v_aug(v_ref, va_s, d)
    for j in range(hpb):
        q = q_ref[0, :, j * d:(j + 1) * d]
        if q_scale is not None:
            q = (q.astype(jnp.float32) * q_scale).astype(q_ref.dtype)
        k = k_ref[0, :, j * d:(j + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if kv_len < bkv:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        _softmax_pv(s, j, d, v_ref, o_ref, sum_mxu, va_s, maxfree)


def _kernel_single_int8(q_ref, k_ref, v_ref, o_ref, *maybe_va, kv_len, bkv,
                        d, hpb, q_scale, maxfree=True):
    """Single-pass attention with the score dot on the int8 MXU (394 TOPS).

    q/k quantize IN-KERNEL on the VMEM-resident blocks (per-row scales
    for q — a natural [bq, 1] column — and ONE scalar scale for the k
    block, so no scale array ever touches HBM and no cross-lane
    transposes appear).  The scalar k scale costs accuracy only against
    outlier k rows: measured 1.5% max relative output error on N(0,1)
    inputs at N=1024 and 2.6% with an 8x-outlier k row, vs 0.8% for
    per-row k scales — the no-extra-HBM-pass trade is worth it (an
    XLA-side per-(token,head) quantize costs a full read+write of q and k
    per site).  p@v deliberately stays bf16: quantizing the probability
    matrix at int8 resolution measured up to 16% relative error on flat
    softmax rows (the 1/127 step is too coarse for many small p).
    ``q_scale`` folds the softmax scale and log2 e into the dequant.
    Like `_kernel_single`, takes the sum-free MXU route (`_build_v_aug`)
    when the ``va_s`` scratch is supplied (d=64/hpb=2).
    """
    sum_mxu = bool(maybe_va)
    va_s = None
    if sum_mxu:
        va_s = maybe_va[0]

        @pl.when(pl.program_id(1) == 0)
        def _build():
            _build_v_aug(v_ref, va_s, d)
    for j in range(hpb):
        qj = q_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        sq = jnp.maximum(jnp.max(jnp.abs(qj), axis=1, keepdims=True),
                         1e-6) * (1.0 / 127.0)
        qq = jnp.clip(jnp.round(qj * pl.reciprocal(sq, approx=False)),
                      -127.0, 127.0).astype(jnp.int8)
        kj = k_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        sk = jnp.maximum(jnp.max(jnp.abs(kj)), 1e-6) * (1.0 / 127.0)
        kq = jnp.clip(jnp.round(kj * (1.0 / sk)),
                      -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(qq, kq, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = acc.astype(jnp.float32) * (sq * (sk * q_scale))
        if kv_len < bkv:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        _softmax_pv(s, j, d, v_ref, o_ref, sum_mxu, va_s, maxfree)


def _kernel_multi(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
                  *, kv_len, kv_total, bkv, d, hpb, q_scale=None):
    """Streaming kv blocks with the classic running-softmax carry.

    ``kv_total`` is the padded physical kv length (num_kv * bkv): masking
    must trigger whenever kv_len < kv_total — a `kv_len % bkv` test would
    silently skip whole padded blocks when kv_len divides bkv."""
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    for j in range(hpb):
        q = q_ref[0, :, j * d:(j + 1) * d]
        if q_scale is not None:
            q = (q.astype(jnp.float32) * q_scale).astype(q_ref.dtype)
        k = k_ref[0, :, j * d:(j + 1) * d]
        v = v_ref[0, :, j * d:(j + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if kv_len < kv_total:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * bkv
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_prev = m_s[:, j * 8:j * 8 + 1]                     # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_next)
        alpha = jnp.exp2(m_prev - m_next)
        l_prev = l_s[:, j * 8:(j + 1) * 8]
        l_s[:, j * 8:(j + 1) * 8] = l_prev * alpha + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
        m_s[:, j * 8:(j + 1) * 8] = jnp.broadcast_to(
            m_next, (m_next.shape[0], 8))
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_s[:, j * d:(j + 1) * d] = acc_s[:, j * d:(j + 1) * d] * alpha + pv

    @pl.when(kv_idx == num_kv - 1)
    def _fin():
        for j in range(hpb):
            o_ref[0, :, j * d:(j + 1) * d] = (
                acc_s[:, j * d:(j + 1) * d] / l_s[:, j * 8:j * 8 + 1]
            ).astype(o_ref.dtype)


def _sum_mxu_extras(d: int, hpb: int, bkv: int, dtype, enabled: bool = True):
    """(scratch_shapes, dimension_semantics) for the single-pass kernels.

    The sum-free MXU route (`_build_v_aug`) applies at d=64 / hpb=2 —
    every SDXL UNet attention site.  Its v-augmentation scratch carries
    state across q-block grid steps, so the q dim must be "arbitrary"
    (sequential); no loss on v5e's single tensorcore.

    ``enabled`` gates by kernel family: measured on v5e (chained-wall
    microbench, tools/bench_attention.py), the bf16 kernel gains ~8-11%
    at N=4096 (9.5 -> 8.4-8.8 ms, B=16 H=10 — the VPU sum pass was on
    the critical path), while the int8-score variants are neutral-to-
    slower (their MXU already carries the quantized score dot, so the
    extra 128-wide pv lanes cost more than the VPU sum they replace) —
    the int8 call sites pass enabled=False.  CFGPP_NO_SUM_MXU=1 disables
    everywhere (read at trace time; same A/B contract as
    CFGPP_NO_KV_CACHE).

    The bkv >= 2048 gate is measured, not guessed: the VPU sum pass this
    route removes is O(bq*bkv) while the augmented dot widens a 64-wide pv
    MXU dot to 128 lanes, so the trade only pays when the kv block is
    long.  Interleaved 4-way attribution on the sdxl_int8 op-point
    (tools/ab_levers.py, 2026-08-19) measured the ungated version -1.8%
    end-to-end — all its bf16-kernel call sites there are bkv=128
    cross-attention, where doubling the tiny pv dot costs more than the
    trivial sum it saves.  N=4096 self-attention (bkv=4096) keeps the
    measured +8-9% kernel win."""
    import os
    if os.environ.get("CFGPP_NO_SUM_MXU") == "1":
        enabled = False
    if bkv < 2048:
        enabled = False
    if enabled and d == 64 and hpb == 2:
        return ([pltpu.VMEM((2, bkv, 2 * d), dtype)],
                ("parallel", "arbitrary", "arbitrary"))
    return ([], ("parallel", "parallel", "arbitrary"))


def heads_per_block(num_heads: int, d: int) -> int:
    """How many heads one grid step covers.  The channel block must be a
    multiple of 128 lanes or span the full channel dim (Mosaic tiling rule)."""
    if d % 128 == 0:
        return 1
    if 128 % d == 0:
        hpb = 128 // d
        if num_heads % hpb == 0:
            return hpb
    return num_heads  # full channel row (block dim == array dim is allowed)


def packed_views_legal(num_heads: int, d: int) -> bool:
    """Mosaic lane rule for the packed-qkv channel-offset views.

    A BlockSpec's last-dim block must be a multiple of 128 lanes OR equal
    the full array dim.  The packed [B, N, 3*H*D] array's views are
    ``hpb*d`` wide and can never equal the 3*H*D array dim, so they are
    only legal when ``hpb*d % 128 == 0`` (true for SDXL's d=64 -> ld=128;
    false for SD-1.5's d=40 -> ld=320, which must split the pack and use
    the contiguous-array kernels, where block == array dim is allowed).
    CPU interpret mode does not enforce this, so tests assert the
    predicate directly (tests/test_flash_attention.py)."""
    return (heads_per_block(num_heads, d) * d) % 128 == 0


def _split_pack(qkv: jnp.ndarray):
    hd = qkv.shape[-1] // 3
    # a tuple, not a generator: a generator is one-shot, so a second
    # iteration (or len()) by a future caller would silently yield nothing
    return tuple(jax.lax.slice_in_dim(qkv, i * hd, (i + 1) * hd, axis=2)
                 for i in range(3))


def _pick_blocks(nq: int, nkv_pad: int, d: int, hpb: int):
    """(block_q, block_kv, single_pass) under the VMEM budget."""
    ld = hpb * d

    def vmem(bq, bkv):
        blocks = (bq * ld + 2 * bkv * ld + bq * ld) * 2 * 2  # dbl-buffered bf16
        s = bq * bkv * 4
        acc = bq * ld * 4 + bq * 8 * hpb * 8
        # sum-free MXU route (d=64/hpb=2 single-pass): v-augmentation
        # scratch [2, bkv, 128] in the block dtype (see _sum_mxu_extras)
        aug = 2 * bkv * 2 * d * 2 if (d == 64 and hpb == 2) else 0
        return blocks + s + acc + aug

    if nkv_pad <= 4096:  # single pass: whole kv in one block
        bq = min(nq, 1024)
        while bq > 256 and vmem(bq, nkv_pad) > _VMEM_BUDGET:
            bq //= 2
        if vmem(bq, nkv_pad) <= _VMEM_BUDGET:
            return bq, nkv_pad, True
    bq, bkv = min(nq, 512), min(nkv_pad, 1024)
    while bkv > 128 and vmem(bq, bkv) > _VMEM_BUDGET:
        bkv //= 2
    while bq > 128 and vmem(bq, bkv) > _VMEM_BUDGET:
        bq //= 2
    return bq, bkv, False


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "kv_len", "block_q", "block_kv",
                     "interpret"))
def flash_attention_hd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    kv_len: int | None = None,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: [B, Nq, H*D], k/v: [B, Nkv, H*D] -> [B, Nq, H*D].  Non-causal.

    ``kv_len``: true valid kv length when k/v arrive pre-padded to the
    lane tile (the UNet pads the 77-token cross-attention context ONCE per
    forward instead of letting every site pad its own k/v projections —
    saves ~140 pad ops/step); rows >= kv_len are masked out exactly like
    in-kernel padding.
    """
    b, nq, hd = q.shape
    nkv_in = k.shape[1]                       # physical rows (maybe pre-padded)
    nkv = kv_len if kv_len is not None else nkv_in   # logical valid rows
    if nkv > nkv_in:
        raise ValueError(f"kv_len={nkv} exceeds k rows {nkv_in}")
    d = hd // num_heads
    if hd % num_heads:
        raise ValueError(f"channel dim {hd} not divisible by {num_heads} heads")
    hpb = heads_per_block(num_heads, d)
    ld = hpb * d

    # fold the softmax scale and the exp->exp2 base change into q; this is a
    # cheap elementwise op that XLA fuses into the producing matmul
    q = q * jnp.asarray(d ** -0.5 * LOG2E, q.dtype)

    nkv_pad = _cdiv(nkv_in, 128) * 128
    auto_bq, auto_bkv, single = _pick_blocks(nq, nkv_pad, d, hpb)
    bq = block_q or auto_bq
    bkv = block_kv or auto_bkv
    single = nkv_pad == bkv

    nq_pad = _cdiv(nq, bq) * bq
    nkv_pad = _cdiv(nkv_pad, bkv) * bkv
    if nq_pad != nq:
        q = jnp.pad(q, [(0, 0), (0, nq_pad - nq), (0, 0)])
    if nkv_pad != nkv_in:
        k = jnp.pad(k, [(0, 0), (0, nkv_pad - nkv_in), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, nkv_pad - nkv_in), (0, 0)])

    nh = num_heads // hpb
    grid = (b * nh, nq_pad // bq, nkv_pad // bkv)
    in_specs = [
        pl.BlockSpec((1, bq, ld), lambda g, iq, ik, n=nh: (g // n, iq, g % n)),
        pl.BlockSpec((1, bkv, ld), lambda g, iq, ik, n=nh: (g // n, ik, g % n)),
        pl.BlockSpec((1, bkv, ld), lambda g, iq, ik, n=nh: (g // n, ik, g % n)),
    ]
    out_spec = pl.BlockSpec((1, bq, ld), lambda g, iq, ik, n=nh: (g // n, iq, g % n))
    scratch, semantics = _sum_mxu_extras(d, hpb, bkv, q.dtype)
    common = dict(
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, hd), q.dtype),
        interpret=interpret,
    )
    if single:
        kern = functools.partial(_kernel_single, kv_len=nkv, bkv=bkv, d=d,
                                 hpb=hpb, maxfree=_maxfree_enabled())
        out = pl.pallas_call(
            kern, **common, scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics,
                vmem_limit_bytes=_VMEM_LIMIT))(q, k, v)
    else:
        kern = functools.partial(_kernel_multi, kv_len=nkv, kv_total=nkv_pad,
                                 bkv=bkv, d=d, hpb=hpb)
        out = pl.pallas_call(
            kern, **common,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT),
            scratch_shapes=[
                pltpu.VMEM((bq, 8 * hpb), jnp.float32),   # running max
                pltpu.VMEM((bq, 8 * hpb), jnp.float32),   # running sum
                pltpu.VMEM((bq, ld), jnp.float32),        # output accumulator
            ])(q, k, v)
    if nq_pad != nq:
        out = out[:, :nq]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "kv_len", "block_q", "interpret"))
def flash_attention_hd_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    kv_len: int | None = None,
    block_q: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8-score attention: q/k/v [B, N, H*D] -> [B, Nq, H*D], non-causal.

    Opt-in fast path for the quantized model (models/quant.py): the
    logits dot runs on the int8 MXU at 2x the bf16 peak, with q/k
    quantized in-kernel on the VMEM-resident blocks — the HBM traffic is
    IDENTICAL to the bf16 kernel (see `_kernel_single_int8` for the scale
    scheme and numerics).  Requires the whole kv sequence in one block
    (true for every UNet attention site: N <= 4096); falls back to the
    bf16 kernel otherwise.
    """
    b, nq, hd = q.shape
    nkv_in = k.shape[1]
    nkv = kv_len if kv_len is not None else nkv_in
    d = hd // num_heads
    if hd % num_heads:
        raise ValueError(f"channel dim {hd} not divisible by {num_heads} heads")
    hpb = heads_per_block(num_heads, d)
    ld = hpb * d
    nh = num_heads // hpb

    nkv_pad = _cdiv(nkv_in, 128) * 128
    auto_bq, auto_bkv, single = _pick_blocks(nq, nkv_pad, d, hpb)
    if not (single and auto_bkv == nkv_pad):
        return flash_attention_hd(q, k, v, num_heads, kv_len=kv_len,
                                  interpret=interpret)
    bq = block_q or auto_bq
    bkv = nkv_pad

    nq_pad = _cdiv(nq, bq) * bq
    if nq_pad != nq:
        q = jnp.pad(q, [(0, 0), (0, nq_pad - nq), (0, 0)])
    if nkv_pad != nkv_in:
        k = jnp.pad(k, [(0, 0), (0, nkv_pad - nkv_in), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, nkv_pad - nkv_in), (0, 0)])

    grid = (b * nh, nq_pad // bq, 1)
    in_specs = [
        pl.BlockSpec((1, bq, ld), lambda g, iq, ik, n=nh: (g // n, iq, g % n)),
        pl.BlockSpec((1, bkv, ld), lambda g, iq, ik, n=nh: (g // n, 0, g % n)),
        pl.BlockSpec((1, bkv, ld), lambda g, iq, ik, n=nh: (g // n, 0, g % n)),
    ]
    scratch, semantics = _sum_mxu_extras(d, hpb, bkv, v.dtype, enabled=False)
    out = pl.pallas_call(
        functools.partial(_kernel_single_int8, kv_len=nkv, bkv=bkv, d=d,
                          hpb=hpb, q_scale=d ** -0.5 * LOG2E,
                          maxfree=_maxfree_enabled()),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, ld),
                               lambda g, iq, ik, n=nh: (g // n, iq, g % n)),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, hd), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, k, v)
    if nq_pad != nq:
        out = out[:, :nq]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "interpret"))
def flash_attention_qkv_packed_int8(
    qkv: jnp.ndarray,
    num_heads: int,
    block_q: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8-score self-attention on a packed [B, N, 3*H*D] qkv projection.

    Same kernel as `flash_attention_hd_int8` (in-kernel q/k quantize,
    int8 MXU logits dot, bf16 p@v); q/k/v are three channel-offset
    BlockSpec views of the pack — identical HBM traffic to the bf16
    packed kernel.
    """
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    if hd3 % 3 or hd % num_heads:
        raise ValueError(f"packed channel dim {hd3} not 3*H*D for H={num_heads}")
    if not packed_views_legal(num_heads, d):
        q_s, k_s, v_s = _split_pack(qkv)
        return flash_attention_hd_int8(q_s, k_s, v_s, num_heads,
                                       block_q=block_q, interpret=interpret)
    hpb = heads_per_block(num_heads, d)
    ld = hpb * d
    nh = num_heads // hpb

    nkv_pad = _cdiv(n, 128) * 128
    auto_bq, auto_bkv, single = _pick_blocks(n, nkv_pad, d, hpb)
    if not (single and auto_bkv == nkv_pad) or n % 128:
        return flash_attention_qkv_packed(qkv, num_heads, block_q=block_q,
                                          interpret=interpret)
    bq = block_q or auto_bq
    bkv = nkv_pad

    nq_pad = _cdiv(n, bq) * bq
    if nq_pad != n:
        qkv = jnp.pad(qkv, [(0, 0), (0, nq_pad - n), (0, 0)])

    grid = (b * nh, nq_pad // bq, 1)
    in_specs = [
        pl.BlockSpec((1, bq, ld), lambda g, iq, ik, n_=nh: (g // n_, iq, g % n_)),
        pl.BlockSpec((1, bkv, ld),
                     lambda g, iq, ik, n_=nh: (g // n_, 0, n_ + g % n_)),
        pl.BlockSpec((1, bkv, ld),
                     lambda g, iq, ik, n_=nh: (g // n_, 0, 2 * n_ + g % n_)),
    ]
    scratch, semantics = _sum_mxu_extras(d, hpb, bkv, qkv.dtype, enabled=False)
    out = pl.pallas_call(
        functools.partial(_kernel_single_int8, kv_len=n, bkv=bkv, d=d,
                          hpb=hpb, q_scale=d ** -0.5 * LOG2E,
                          maxfree=_maxfree_enabled()),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, ld),
                               lambda g, iq, ik, n_=nh: (g // n_, iq, g % n_)),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, hd), jnp.bfloat16),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv, qkv, qkv)
    if nq_pad != n:
        out = out[:, :n]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "block_kv", "interpret"))
def flash_attention_qkv_packed(
    qkv: jnp.ndarray,
    num_heads: int,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Self-attention on a PACKED [B, N, 3*H*D] qkv projection -> [B, N, H*D].

    The fused to_qkv projection (models/quant.py path) emits q|k|v
    concatenated on the channel dim.  Rather than slicing (which would
    materialize three [B,N,H*D] copies to satisfy the custom call's dense
    layout), the kernel reads q/k/v as three channel-offset BlockSpec views
    of the SAME array — the pack IS the kernel's native layout.  The
    softmax scale (d^-1/2 * log2e) is applied in-kernel on the q block
    (bq*ld VPU mult, negligible), since pre-scaling a slice in HBM would
    also cost a full copy.
    """
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    if hd3 % 3 or hd % num_heads:
        raise ValueError(f"packed channel dim {hd3} not 3*H*D for H={num_heads}")
    if not packed_views_legal(num_heads, d):
        # d=40 (SD-1.5 first level): ld=320 channel views violate the
        # Mosaic lane rule on real TPU (CPU interpret does not check it).
        # Split the pack (three [B,N,H*D] slice copies, ~10MB each at
        # 512^2 — amortized against a 4096-token attention) and use the
        # contiguous-array kernel, whose ld == array dim blocks are legal.
        q_s, k_s, v_s = _split_pack(qkv)
        return flash_attention_hd(q_s, k_s, v_s, num_heads, block_q=block_q,
                                  block_kv=block_kv, interpret=interpret)
    hpb = heads_per_block(num_heads, d)
    ld = hpb * d
    nh = num_heads // hpb

    nkv_pad = _cdiv(n, 128) * 128
    auto_bq, auto_bkv, single = _pick_blocks(n, nkv_pad, d, hpb)
    bq = block_q or auto_bq
    bkv = block_kv or auto_bkv

    nq_pad = _cdiv(n, bq) * bq
    nkv_pad = _cdiv(nkv_pad, bkv) * bkv
    npad = max(nq_pad, nkv_pad)
    single = nkv_pad == bkv
    if npad != n:
        qkv = jnp.pad(qkv, [(0, 0), (0, npad - n), (0, 0)])

    grid = (b * nh, nq_pad // bq, nkv_pad // bkv)
    in_specs = [
        pl.BlockSpec((1, bq, ld),
                     lambda g, iq, ik, n_=nh: (g // n_, iq, g % n_)),
        pl.BlockSpec((1, bkv, ld),
                     lambda g, iq, ik, n_=nh: (g // n_, ik, n_ + g % n_)),
        pl.BlockSpec((1, bkv, ld),
                     lambda g, iq, ik, n_=nh: (g // n_, ik, 2 * n_ + g % n_)),
    ]
    out_spec = pl.BlockSpec((1, bq, ld),
                            lambda g, iq, ik, n_=nh: (g // n_, iq, g % n_))
    scale = d ** -0.5 * LOG2E
    common = dict(
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, hd), qkv.dtype),
        interpret=interpret,
    )
    if single:
        kern = functools.partial(_kernel_single, kv_len=n, bkv=bkv, d=d,
                                 hpb=hpb, q_scale=scale,
                                 maxfree=_maxfree_enabled())
        scratch, semantics = _sum_mxu_extras(d, hpb, bkv, qkv.dtype)
        out = pl.pallas_call(
            kern, **common, scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics,
                vmem_limit_bytes=_VMEM_LIMIT))(qkv, qkv, qkv)
    else:
        kern = functools.partial(_kernel_multi, kv_len=n, kv_total=nkv_pad,
                                 bkv=bkv, d=d, hpb=hpb, q_scale=scale)
        out = pl.pallas_call(
            kern, **common,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT),
            scratch_shapes=[
                pltpu.VMEM((bq, 8 * hpb), jnp.float32),
                pltpu.VMEM((bq, 8 * hpb), jnp.float32),
                pltpu.VMEM((bq, ld), jnp.float32),
            ])(qkv, qkv, qkv)
    if nq_pad != n:
        out = out[:, :n]
    return out


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-split compatibility API: q,k,v [B, N, H, D] -> [B, N, H, D].
    The [B,N,H,D] -> [B,N,H*D] reshape is free (contiguous)."""
    b, nq, h, d = q.shape
    nkv = k.shape[1]
    out = flash_attention_hd(
        q.reshape(b, nq, h * d), k.reshape(b, nkv, h * d),
        v.reshape(b, nkv, h * d), h,
        block_q=block_q, block_kv=block_kv, interpret=interpret)
    return out.reshape(b, nq, h, d)
