"""Measure the FF-GEGLU gelu-flavor lever: erf vs sigmoid epilogue.

The round-4 roofline ledger (INT8.md) bounded the last FF-epilogue lever —
a cheaper gelu polynomial — at <100 us/call on the level-2 SDXL shape.
This tool measures it: `int8_ff_geglu` at both SDXL shapes with the exact
erf-gelu vs the x*sigmoid(1.702x) approximation (~4 VPU ops vs ~13),
chained-wall timing on the real chip.

Usage: python tools/bench_gelu.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from cfgpp_tpu.kernels.int8_matmul import int8_ff_geglu
    from cfgpp_tpu.models.quant import quantize_kernel_int8

    def sync(x):
        jax.device_get(jax.tree.leaves(x)[0].ravel()[0])
        return x

    def timed(fn, reps=30):
        sync(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / reps

    rng = np.random.default_rng(0)
    out = {"unit": "us/call", "shapes": {}}
    # (m, k, n): SDXL level-2 and level-1 FF shapes (INT8.md measured rates)
    for m, k, n in ((8192, 1280, 5120), (32768, 640, 2560)):
        x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
        w1q, w1s = quantize_kernel_int8(
            rng.normal(0, 0.05, (k, 2 * n)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.1, (2 * n,)), jnp.float32)
        w2q, w2s = quantize_kernel_int8(
            rng.normal(0, 0.05, (n, k)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.1, (k,)), jnp.float32)
        # interleaved A/B pairs (the repo's bench discipline: tunnel/host
        # drift between separately-timed blocks measured larger than the
        # lever itself — deltas 55-630 us across three block-timed runs)
        fns = {f: (lambda f=f: int8_ff_geglu(x, w1q, w1s, b1, w2q, w2s, b2,
                                             gelu=f))
               for f in ("erf", "sigmoid")}
        for fn in fns.values():
            sync(fn())  # compile + warm both before any timing

        def leg(fn, chain=10):
            # chain several dispatches per timed leg so the per-sync
            # tunnel overhead (~ms) amortizes out of a ~2 ms kernel
            out = None
            for _ in range(chain):
                out = fn()
            sync(out)
            return chain

        pairs = 12
        ta, tb = [], []
        for _ in range(pairs):
            t0 = time.perf_counter(); c = leg(fns["erf"])
            t1 = time.perf_counter(); leg(fns["sigmoid"])
            t2 = time.perf_counter()
            ta.append((t1 - t0) / c); tb.append((t2 - t1) / c)
        import statistics
        deltas = [a - b for a, b in zip(ta, tb)]
        mean_d = statistics.mean(deltas)
        sd_d = statistics.stdev(deltas)
        row = {
            "erf": round(statistics.mean(ta) * 1e6, 1),
            "sigmoid": round(statistics.mean(tb) * 1e6, 1),
            "pairs": pairs,
            "delta_us": round(mean_d * 1e6, 1),
            "delta_sd_us": round(sd_d * 1e6, 1),
            "speedup": round(statistics.mean(ta) / statistics.mean(tb), 4),
            "t_stat": round(mean_d / (sd_d / pairs ** 0.5), 2),
        }
        out["shapes"][f"{m}x{k}x{n}"] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
