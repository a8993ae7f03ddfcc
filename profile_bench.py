"""Segment-level profiling of the SDXL pipeline on TPU (dev tool).

Times the three jitted segments separately — text encode, the 24-step UNet
scan, VAE decode — to locate where the 1 img/s budget goes.
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from cfgpp_tpu.engine import DiffusionEngine, ModelBundle  # noqa: E402


def _sync(out):
    # On the tunneled TPU backend block_until_ready returns before execution
    # completes; materializing one element to host is the only reliable sync.
    import numpy as np
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return out


def timed(name, fn, *args, reps=3):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _sync(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1000:9.1f} ms")
    return out, dt


def main():
    bundle = ModelBundle.random_init("sdxl", dtype=jnp.bfloat16,
                                     param_dtype=jnp.bfloat16)
    engine = DiffusionEngine(bundle, solver="dpm++_2m_cfgpp", nfe=25)
    res = 1024

    ids1 = engine.tokenize(["a benchmark prompt"])
    ids2 = engine.tokenize_2(["a benchmark prompt"])

    # text encode
    te = jax.jit(engine._text_embed_sdxl)
    (emb, pooled), t_text = timed(
        "text encode (dual)",
        lambda: te(bundle.text_params, bundle.text_params_2, ids1, ids2))

    # single batch-2 UNet eval
    lat = engine.latent_shape(1, res)
    zt = jnp.zeros((2,) + lat[1:], jnp.bfloat16)
    ctx = jnp.concatenate([emb, emb], 0).astype(jnp.bfloat16)
    pool2 = jnp.concatenate([pooled, pooled], 0)
    tids = jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]] * 2, jnp.float32)
    unet_fn = jax.jit(lambda p, z, t, c, pl, ti: bundle.unet.apply(p, z, t, c, pl, ti))
    _, t_unet = timed(
        "UNet fwd (batch-2, 1024^2)",
        lambda: unet_fn(bundle.unet_params, zt, jnp.array([500, 500]), ctx, pool2, tids))

    # VAE decode fp32 (current policy)
    z0 = jnp.zeros(lat, jnp.float32)
    dec = jax.jit(engine._decode)
    _, t_vae = timed("VAE decode (fp32)", lambda: dec(bundle.vae_params, z0))

    # VAE decode bf16 weights/compute
    from cfgpp_tpu.models import AutoencoderKL
    vae16 = AutoencoderKL(bundle.config.vae, dtype=jnp.bfloat16,
                          param_dtype=jnp.bfloat16)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), bundle.vae_params)
    dec16 = jax.jit(lambda p, z: vae16.apply(p, z / 0.13025, method=vae16.decode))
    _, t_vae16 = timed("VAE decode (bf16)", lambda: dec16(p16, z0.astype(jnp.bfloat16)))

    n_steps = 24
    print(f"\nmodeled total: text {t_text*1000:.0f}ms + scan {n_steps}x"
          f"{t_unet*1000:.0f}ms + vae {t_vae*1000:.0f}ms = "
          f"{(t_text + n_steps*t_unet + t_vae)*1000:.0f}ms")
    print(f"with bf16 vae: {(t_text + n_steps*t_unet + t_vae16)*1000:.0f}ms")


if __name__ == "__main__":
    main()
