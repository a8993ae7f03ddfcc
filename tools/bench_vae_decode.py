"""VAE decode bench: dtype x chunking variants + the overlap question.

Round-4 verdict flagged VAE decode as the biggest untouched bucket
(~90 ms/img at 1024^2, 16% of the Lightning budget; reference decode path
`latent_sdxl.py:150-164`).  This tool measures, on the real chip:

  * decode time per image for fp32 vs bf16 compute (fp32 GroupNorm stats
    either way — flax norm computes statistics in fp32 unless dtype says
    otherwise via `use_fast_variance`; params are fp32 in both cases), at
    per-image / chunk-2 / chunk-4 lax.map granularity;
  * bf16-vs-fp32 image drift (MAE in the [0,1] output scale) — the
    numerics cost of the fast variant;
  * an overlap probe: can a second XLA program make progress while a
    decode runs?  Two independently-jitted programs are dispatched
    interleaved (A B A B) and the wall time is compared against the sum
    of their serial times.  On a single TensorCore, XLA programs execute
    sequentially, so "overlap the next batch's UNet with this batch's
    decode" buys ~nothing on one chip — this probe turns that claim into
    a measured number (the honest alternative to a double-buffered
    sample_batch that could not help).

Usage:  python tools/bench_vae_decode.py [--res 1024] [--batch 4]
Prints one JSON line (commit as evidence/vae_decode_r5.json).
"""

from __future__ import annotations

import argparse
import json
import time


def sync(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    jax.device_get(leaf.ravel()[0])
    return x


def timed(fn, reps=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cfgpp_tpu.configs import get_bundle_config
    from cfgpp_tpu.models import AutoencoderKL

    # only the VAE: materializing the full bundle would park the 5.1GB
    # SDXL UNet in HBM for nothing and OOM the fp32 decode variants
    cfg = get_bundle_config("sdxl").vae
    vae_init = AutoencoderKL(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    vae_params = jax.jit(vae_init.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, cfg.in_channels)),
        jax.random.PRNGKey(0))
    lat = args.res // cfg.scale_factor
    z = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch, lat, lat, cfg.latent_channels),
                          jnp.float32)
    scale = cfg.scaling_factor

    def make_decode(dtype, chunk):
        vae = AutoencoderKL(cfg, dtype=dtype, param_dtype=jnp.float32)

        def one(zi):
            img = vae.apply(vae_params, (zi / scale).astype(jnp.float32),
                            method=vae.decode)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        def decode(zz):
            if chunk >= zz.shape[0]:
                return one(zz)
            zr = zz.reshape((zz.shape[0] // chunk, chunk) + zz.shape[1:])
            return jax.lax.map(one, zr).reshape((-1,) + zz.shape[1:])

        return jax.jit(decode)

    out = {"res": args.res, "batch": args.batch, "reps": args.reps,
           "unit": "ms/img", "variants": {}}
    ref_img = None
    # fp32 at chunk=batch is a known HBM OOM at 1024^2 (fp32 decoder
    # intermediates ~2GB/img; the reason pipeline._decode chunks at all)
    # — skip rather than poison the rest of the run with fragmentation
    cases = [("fp32", jnp.float32, 1), ("fp32", jnp.float32, 2),
             ("bf16", jnp.bfloat16, 1), ("bf16", jnp.bfloat16, 2),
             ("bf16", jnp.bfloat16, args.batch)]
    for dtype_name, dtype, chunk in cases:
        key = f"{dtype_name}_chunk{chunk}"
        try:
            fn = make_decode(dtype, chunk)
            t = timed(lambda: fn(z), reps=args.reps)
            out["variants"][key] = round(t / args.batch * 1000, 2)
            if dtype_name == "fp32" and ref_img is None:
                ref_img = jax.device_get(fn(z)).astype("float32")
            if dtype_name == "bf16" and chunk == 1:
                img = jax.device_get(fn(z)).astype("float32")
                import numpy as np
                out["bf16_vs_fp32_mae"] = float(np.mean(np.abs(img - ref_img)))
                out["bf16_vs_fp32_max"] = float(np.max(np.abs(img - ref_img)))
                out["drift_note"] = (
                    "MAE in the [0,1] image scale; 8-bit PNG quantum is "
                    "1/255=0.0039 — drift below that is invisible in "
                    "the saved artifact")
        except Exception as e:  # OOM at big chunks is a finding, not a crash
            out["variants"][key] = f"failed: {type(e).__name__}"
        finally:
            # free the variant's executable + its HBM scratch reservation
            # before compiling the next one (accumulated executables OOMed
            # the first version of this tool at the probe stage)
            del fn
            jax.clear_caches()

    # ---- overlap probe: two independent programs, interleaved dispatch
    dec = make_decode(jnp.bfloat16, 1)
    w = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_loop(w):
        def body(x, _):
            return jnp.tanh(x @ w), None
        x0 = jnp.eye(4096, dtype=jnp.bfloat16)
        x, _ = jax.lax.scan(body, x0, None, length=40)
        return x

    t_dec = timed(lambda: dec(z), reps=3)
    t_mm = timed(lambda: mm_loop(w), reps=3)

    def interleaved():
        a = dec(z)
        b = mm_loop(w)
        a2 = dec(z)
        b2 = mm_loop(w)
        return a, b, a2, b2

    t_both = timed(interleaved, reps=3) / 2.0
    overlap_frac = 1.0 - t_both / (t_dec + t_mm)
    out["overlap_probe"] = {
        "decode_s": round(t_dec, 4), "mm_loop_s": round(t_mm, 4),
        "interleaved_pair_s": round(t_both, 4),
        "overlap_fraction": round(overlap_frac, 4),
        "note": ("fraction of the serial sum hidden by interleaved "
                 "dispatch of two independent XLA programs on one chip; "
                 "~0 means programs serialize on the single TensorCore "
                 "and a double-buffered decode-vs-next-UNet overlap "
                 "cannot pay on one chip"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
