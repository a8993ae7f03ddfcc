"""Headline benchmark: SDXL 1024x1024 25-NFE throughput on one chip.

Op-point: DPM++ 2M CFG++ at cfg_guidance 5.0 (BASELINE.md: 'SDXL DPM++ 2M
CFG++, 1024x1024, 25 NFE'), random-init bf16 weights at the true SDXL
architecture (2.57B-param UNet, dual text encoders, fp32 VAE decode) — the
compute graph is identical to a checkpointed run; no weight downloads exist
in this environment.

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": value/1.0}
(the driver's north-star target is >= 1 image/sec/chip on v5e).
"""

from __future__ import annotations

import json
import time


def main():
    import jax

    # Persistent compilation cache: the SDXL scan is expensive to compile
    # once (~minutes); every later bench run reuses it.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # batch 1 measured fastest end-to-end on this chip (batch 2: -1%,
        # batch 4: -17% from HBM pressure); keep the throughput metric
        # honest by reporting the best per-chip configuration.
        model, res, nfe, reps, batch = "sdxl", 1024, 25, 3, 1
        dtype = jnp.bfloat16
    else:  # CPU smoke fallback so the script always runs
        model, res, nfe, reps, batch = "tiny_sdxl", 64, 4, 2, 2
        dtype = jnp.float32

    bundle = ModelBundle.random_init(model, dtype=dtype, param_dtype=dtype)
    engine = DiffusionEngine(bundle, solver="dpm++_2m_cfgpp", nfe=nfe)

    prompts = [f"benchmark prompt {i}" for i in range(batch)]

    def one(seed):
        # throughput op-point: batched generation, the same shape the
        # sharded MS-COCO engine runs per chip
        return engine.sample_batch("", prompts, cfg_guidance=5.0,
                                   seed=seed, resolution=res)

    one(0)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(reps):
        img = one(i + 1)
    img.sum()  # host sync (sample_batch already materializes to numpy)
    dt = (time.perf_counter() - t0) / reps

    value = batch / dt
    n_model_steps = nfe - 1  # dpm++_2m_cfgpp runs timesteps[:-1]
    print(json.dumps({
        "metric": f"SDXL {res}x{res} {nfe}-NFE dpm++_2m_cfgpp throughput"
                  + ("" if on_tpu else " (CPU smoke, tiny model)"),
        "value": round(value, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 1.0, 4),
        "batch": batch,
        "seconds_per_image": round(dt / batch, 4),
        "unet_step_ms": round(dt / batch / n_model_steps * 1000.0, 2),
    }))


if __name__ == "__main__":
    main()
