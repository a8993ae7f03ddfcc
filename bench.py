"""Benchmark: all three reference op-points on one chip, one JSON line.

Op-points (BASELINE.md):
  * sdxl           — SDXL 1024^2 25-NFE dpm++_2m_cfgpp, w=5.0 (headline;
                     the driver's north star is >= 1 image/sec/chip on v5e)
  * sd15           — SD-v1.5 512^2 50-NFE ddim_cfg++, lambda=0.6
                     (reference flagship command, README.md:62)
  * sdxl_lightning — SDXL-Lightning 1024^2 4-NFE ddim_cfg++_lightning, w=1
                     (reference published config, README.md:70-74)

Weights are random-init bf16 at the true architectures (2.57B-param SDXL
UNet, dual text encoders) — the compute graph is identical to a
checkpointed run; no weight downloads exist in this environment.

Prints ONE JSON line: the headline metric/value/vs_baseline plus an
``op_points`` map with every op-point's throughput, per-image seconds,
per-step milliseconds and model FLOP utilization (MFU, exact FLOP count
from cfgpp_tpu/utils/flops.py over the v5e 197 TF/s bf16 peak).
"""

from __future__ import annotations

import argparse
import json
import time

V5E_PEAK_BF16 = 197e12  # dense bf16 FLOP/s per v5e chip


OP_POINTS = {
    # name: (model, solver, res, nfe, reps, batch, w, family, quant)
    # sdxl batch=4 measured fastest per chip (sweep on v5e: b1 0.324,
    # b2 0.300, b4 0.371, b6 0.341, b8 0.351 img/s) — big enough to tile
    # the MXU well, small enough to stay out of HBM pressure
    "sdxl": ("sdxl", "dpm++_2m_cfgpp", 1024, 25, 3, 4, 5.0, "SDXL", False),
    # opt-in int8 W8A8 (Pallas fused matmul, dense-only): NOT the exact
    # path — numerics differ from bf16; reported separately.  Runs right
    # after sdxl to share its base bundle (HBM holds one base at a time)
    "sdxl_int8": ("sdxl", "dpm++_2m_cfgpp", 1024, 25, 3, 4, 5.0,
                  "SDXL-int8-W8A8", True),
    # sd15 b4 1.175 img/s vs b1 0.90, b8 1.185 (flat); lightning b4 1.53
    # vs b1 1.22 — batch 4 across the board
    "sd15": ("sd15", "ddim_cfg++", 512, 50, 5, 4, 0.6, "SD-v1.5", False),
    "sdxl_lightning": ("sdxl_lightning", "ddim_cfg++_lightning", 1024, 4,
                       5, 4, 1.0, "SDXL-Lightning", False),
}


def run_op_point(name, jnp, on_tpu, bundle_cache):
    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle
    from cfgpp_tpu.utils.flops import pipeline_flops

    model, solver, res, nfe, reps, batch, w, family, quant = OP_POINTS[name]
    dtype = jnp.bfloat16
    if not on_tpu:  # CPU smoke fallback so the script always runs
        model, res, nfe, reps, batch = "tiny_sdxl", 64, 4, 2, 2
        solver, w, family, quant = "dpm++_2m_cfgpp", 5.0, "SDXL", False
        dtype = jnp.float32

    if model not in bundle_cache:
        bundle_cache[model] = ModelBundle.random_init(model, dtype=dtype,
                                                      param_dtype=dtype)
    bundle = bundle_cache[model]
    if quant:
        bundle = bundle.quantized()
    engine = DiffusionEngine(bundle, solver=solver, nfe=nfe)
    prompts = [f"benchmark prompt {i}" for i in range(batch)]

    def one(seed):
        # batched generation, the same shape the sharded MS-COCO engine
        # runs per chip
        return engine.sample_batch("", prompts, cfg_guidance=w,
                                   seed=seed, resolution=res, to_uint8=True)

    one(0)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(reps):
        img = one(i + 1)
    img.sum()  # host sync (sample_batch already materializes to numpy)
    dt = (time.perf_counter() - t0) / reps

    n_model_steps = nfe - 1 if solver.startswith("dpm++_2m") else nfe
    # CFG++ needs the true unconditional eps even at w=1 (the lightning
    # op-point runs dual-branch); only plain-CFG w=1 / any w=0 is single
    from cfgpp_tpu.engine.pipeline import _needs_branches
    dual = all(_needs_branches(engine.spec.cfgpp, w))
    flops = pipeline_flops(bundle.config, res, n_model_steps, images=1,
                           dual_branch=dual)
    sec_per_img = dt / batch
    return {
        "metric": f"{family} {res}x{res} {nfe}-NFE {solver} throughput"
                  + ("" if on_tpu else " (CPU smoke, tiny model)"),
        "value": round(batch / dt, 4),
        "unit": "images/sec/chip",
        "batch": batch,
        "reps": reps,
        "seconds_per_image": round(sec_per_img, 4),
        "unet_step_ms": round(sec_per_img / n_model_steps * 1000.0, 2),
        "tflop_per_image": round(flops["total"] / 1e12, 2),
        "mfu": round(flops["total"] / sec_per_img / V5E_PEAK_BF16, 4)
               if on_tpu else None,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--op_point", type=str, default="all",
                        choices=("all",) + tuple(OP_POINTS),
                        help="which op-point(s) to run; default all three")
    args = parser.parse_args()

    import jax

    # Persistent compilation cache: the SDXL scan is expensive to compile
    # once (~minutes); every later bench run reuses it.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    names = list(OP_POINTS) if (args.op_point == "all" and on_tpu) \
        else [args.op_point if args.op_point != "all" else "sdxl"]

    results = {}
    bundle_cache = {}
    for name in names:
        if OP_POINTS[name][0] not in bundle_cache:
            bundle_cache.clear()     # one base model resident at a time
        results[name] = run_op_point(name, jnp, on_tpu, bundle_cache)

    head = results.get("sdxl", next(iter(results.values())))
    line = dict(head)
    line["vs_baseline"] = round(head["value"] / 1.0, 4)
    line["op_points"] = results
    print(json.dumps(line))


if __name__ == "__main__":
    main()
