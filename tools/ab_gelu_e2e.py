"""Interleaved end-to-end A/B of the FF-GEGLU gelu flavor (erf vs the
opt-in x·sigmoid(1.702x)) on a quantized op-point.

Round-5 context: the kernel-level A/B (tools/bench_gelu.py) measured the
sigmoid epilogue at 205-332 µs/call and INT8.md bounded the end-to-end
effect at 2-4%; a single-run op-point with CFGPP_GELU=sigmoid then
measured 0.5278 img/s vs ~0.49 erf — larger than the bound, but single
runs carry ±8% tunnel variance.  This harness settles it: CFGPP_GELU is
read at TRACE time (kernels/int8_matmul.py), so one process holds both
graphs and interleaves timed reps round-robin, cancelling tunnel drift;
paired per-round deltas give a t-statistic.

Usage: python tools/ab_gelu_e2e.py [--op_point sdxl_int8] [--rounds 6]
Prints one JSON line.
"""
import argparse
import json
import os
import statistics
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op_point", default="sdxl_int8")
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from bench import OP_POINTS
    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

    model, solver, res, nfe, _, batch, w, _, quant = OP_POINTS[args.op_point]
    assert quant, "gelu flavor only exists on the fused int8 path"
    bundle = ModelBundle.random_init(model, dtype=jnp.bfloat16,
                                     param_dtype=jnp.bfloat16)
    bundle = bundle.quantized(mode="all")
    prompts = [f"benchmark prompt {i}" for i in range(batch)]

    engines = {}
    for flavor in ("erf", "sigmoid"):
        os.environ["CFGPP_GELU"] = flavor
        eng = DiffusionEngine(bundle, solver=solver, nfe=nfe)
        eng.sample_batch("", prompts, cfg_guidance=w, seed=0,
                         resolution=res, to_uint8=True)   # compile+warm
        engines[flavor] = eng
        print(f"compiled {flavor}", flush=True)
    os.environ.pop("CFGPP_GELU", None)

    times = {k: [] for k in engines}
    for r in range(args.rounds):
        for flavor, eng in engines.items():
            t0 = time.perf_counter()
            eng.sample_batch("", prompts, cfg_guidance=w, seed=r + 1,
                             resolution=res, to_uint8=True)
            times[flavor].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(
            f"{f}={batch / times[f][-1]:.4f}" for f in times), flush=True)

    out = {}
    for flavor, ts in times.items():
        ips = [batch / t for t in ts]
        out[flavor] = {"img_per_s": round(statistics.mean(ips), 4),
                       "sd": round(statistics.stdev(ips), 4)
                       if len(ips) > 1 else 0.0}
    deltas = [(te - ts_) / te for te, ts_ in
              zip(times["erf"], times["sigmoid"])]   # fraction of erf time saved
    mean_d = statistics.mean(deltas)
    sd_d = statistics.stdev(deltas) if len(deltas) > 1 else 0.0
    print(json.dumps({
        "op_point": args.op_point, "rounds": args.rounds,
        "flavors": out,
        "speedup_mean": round(1.0 / (1.0 - mean_d), 4),
        "speedup_sd": round(sd_d, 4),
        "t_stat": round(mean_d / (sd_d / len(deltas) ** 0.5), 2)
        if sd_d else None,
        "note": ("paired per-round deltas, graphs interleaved in one "
                 "process so tunnel drift cancels; CFGPP_GELU read at "
                 "trace time")}))


if __name__ == "__main__":
    main()
