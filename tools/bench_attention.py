"""Microbench the flash-attention kernels at the SDXL UNet shapes.

Times `flash_attention_hd` / `flash_attention_qkv_packed_int8` on the live
chip and prints achieved TF/s (2*N*N*d*2 FLOPs per head: score + pv dots;
the sum-augmentation column is not counted as useful work).  Used to grade
the sum-free MXU route (kernels/flash_attention.py:_build_v_aug) against
the previously documented 82-83 TF/s VPU-bound ceiling.

Usage: python tools/bench_attention.py [--iters 50]
"""
import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from cfgpp_tpu.kernels.flash_attention import (
    flash_attention_hd, flash_attention_qkv_packed_int8)


def timeit(fn, x, iters=50):
    """Chained timing: each iteration's q is the previous output, so the
    device cannot overlap/elide dispatches (the axon tunnel otherwise
    reports ~0 for unchained loops)."""
    import numpy as np
    out = fn(x)
    float(jnp.sum(out.astype(jnp.float32)))   # force full execution
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    # host fetch — block_until_ready alone does not drain the axon tunnel
    float(jnp.sum(x.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    # SDXL self-attention sites at dual-batch-8 1024^2:
    #   level 1: B=16, N=4096, H=10, d=64 ; level 2: B=16, N=1024, H=20, d=64
    for b, n, h in [(16, 4096, 10), (16, 1024, 20)]:
        hd = h * 64
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                     (b, n, hd), jnp.bfloat16)
                   for i in range(3))
        dt = timeit(lambda x: flash_attention_hd(x, k, v, h), q,
                    iters=args.iters)
        flops = 2 * b * h * (2 * n * n * 64)
        print(f"hd      B={b} N={n} H={h}: {dt*1e3:8.3f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s")
        qkv = jax.random.normal(key, (b, n, 3 * hd), jnp.bfloat16)
        dt = timeit(
            lambda x: jnp.concatenate(
                [flash_attention_qkv_packed_int8(x, h).astype(x.dtype)] * 3,
                axis=-1),
            qkv, iters=args.iters)
        print(f"pk_int8 B={b} N={n} H={h}: {dt*1e3:8.3f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s  (+concat overhead)")


if __name__ == "__main__":
    main()
