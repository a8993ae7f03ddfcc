"""Interleaved 4-way attribution of the round-4 levers on one op-point.

Compiles the same op-point under {kv-hoist, sum-mxu} x {on, off} (the env
kill-switches are read at trace time, so one process can hold all four
graphs) and interleaves timed reps round-robin so tunnel drift cancels.

Usage: python tools/ab_levers.py [--op_point sdxl_int8] [--rounds 4]
"""
import argparse
import json
import os
import statistics
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op_point", default="sdxl_int8")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))   # repo root, for `from bench import`

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from bench import OP_POINTS
    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

    model, solver, res, nfe, _, batch, w, _, quant = OP_POINTS[args.op_point]
    bundle = ModelBundle.random_init(model, dtype=jnp.bfloat16,
                                     param_dtype=jnp.bfloat16)
    if quant:
        bundle = bundle.quantized(mode="all")
    prompts = [f"benchmark prompt {i}" for i in range(batch)]

    configs = {           # (NO_KV_CACHE, NO_SUM_MXU)
        "base":    ("1", "1"),
        "kv":      ("",  "1"),
        "sum":     ("1", ""),
        "kv+sum":  ("",  ""),
    }
    engines = {}
    for name, (nkv, nsum) in configs.items():
        os.environ["CFGPP_NO_KV_CACHE"] = nkv
        os.environ["CFGPP_NO_SUM_MXU"] = nsum
        eng = DiffusionEngine(bundle, solver=solver, nfe=nfe)
        eng.sample_batch("", prompts, cfg_guidance=w, seed=0,
                         resolution=res, to_uint8=True)   # compile+warm
        engines[name] = eng
        print(f"compiled {name}", flush=True)

    times = {k: [] for k in configs}
    for r in range(args.rounds):
        for name, eng in engines.items():
            t0 = time.perf_counter()
            eng.sample_batch("", prompts, cfg_guidance=w, seed=r + 1,
                             resolution=res, to_uint8=True)
            times[name].append(time.perf_counter() - t0)
    out = {}
    for name, ts in times.items():
        ips = [batch / t for t in ts]
        out[name] = {"img_per_s": round(statistics.mean(ips), 4),
                     "sd": round(statistics.stdev(ips), 4) if len(ips) > 1
                     else 0.0}
    print(json.dumps({"op_point": args.op_point, "rounds": args.rounds,
                      "configs": out}))


if __name__ == "__main__":
    main()
