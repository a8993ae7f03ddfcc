#!/usr/bin/env python
"""Per-bucket step budget of the (quantized) SDXL UNet forward on TPU.

Captures a jax.profiler device trace of a few UNet forwards and aggregates
the per-op durations into named buckets (int8 matmul / int8 conv / flash
attention / bf16 convs / elementwise fusions / copies / ...), so the
"where do the other ms go" question (VERDICT r3 weak #1: util_int8_peak
0.40 means 60% of the int8 roofline is unaccounted) is answered with data
instead of guesses.

Usage:
  python tools/profile_quant.py --quant_mode all --batch 4
  python tools/profile_quant.py --no_quant            # bf16 baseline
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import time


def capture_trace(logdir, fn, iters=3):
    import jax

    fn()  # compile + warmup outside the trace
    fn()
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn()
        jax.tree.leaves(out)[0].block_until_ready()
        # tunneled-TPU quirk: force a real sync before closing the trace
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])


def load_trace_events(logdir):
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


BUCKETS = (
    # (bucket, regexes matched against the event name, first hit wins)
    ("int8_matmul(+fused LN/GN/res)", ("int8_matmul", "matmul_int8")),
    ("int8_ff_geglu", ("ff_geglu",)),
    ("int8_conv3x3(+fused GN/SiLU)", ("int8_conv", "conv3x3_int8")),
    ("flash_attention", ("flash", "attn_kernel")),
    ("bf16 convolution", ("conv", "Conv")),
    ("other matmul (bf16 dot)", ("dot", "einsum", "gemm")),
    ("reduce (GN/LN stats, softmax)", ("reduce",)),
    ("copy / transpose / reshape", ("copy", "transpose", "reshape", "pad",
                                    "concatenate", "slice", "bitcast",
                                    "dynamic-update", "dynamic_update")),
    ("elementwise fusion", ("fusion", "loop_", "input_", "output_",
                            "scalar_", "select", "broadcast", "convert",
                            "add", "multiply", "subtract", "tanh", "exp")),
    ("infeed/outfeed/host", ("infeed", "outfeed", "transfer", "host")),
)


def bucket_of(name: str) -> str:
    low = name.lower()
    for bucket, pats in BUCKETS:
        for p in pats:
            if p.lower() in low:
                return bucket
    return "unbucketed"


def aggregate(events, iters):
    # device lanes: pids whose process_name metadata mentions TPU/device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower()}
    # Prefer the per-op lane: the "XLA Modules" lane carries ONE event
    # spanning the whole jitted module, which double-counts the total
    # (and showed up as a bogus 310 ms "jit__lambda" top op).
    op_tids = {k for k, n in tid_names.items()
               if k[0] in device_pids and "xla ops" in n.lower()}
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if op_tids:
            if (e["pid"], e.get("tid")) not in op_tids:
                continue
        # keep compute lanes; skip the step/annotation lanes
        elif "step" in tname.lower() or "module" in tname.lower():
            continue
        dur = e.get("dur", 0) / 1e3 / iters  # us -> ms, per iteration
        name = e.get("name", "?")
        # control-flow wrapper events (the lax.scan/while loop of the
        # --pipeline trace) span their whole body on the same op lane and
        # would double-count every op inside them
        base = name.split(".")[0]
        if base in ("while", "conditional", "call"):
            continue
        per_op[name] += dur
        per_bucket[bucket_of(name)] += dur
        total += dur
    return per_op, per_bucket, total, pid_names, tid_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sdxl")
    ap.add_argument("--quant_mode", default="all", choices=("dense", "all"))
    ap.add_argument("--no_quant", action="store_true",
                    help="profile the exact bf16 UNet instead")
    ap.add_argument("--batch", type=int, default=4,
                    help="image batch; the UNet runs dual (2x) rows")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/quant_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", action="store_true",
                    help="also dump lane names + top raw ops for debugging")
    ap.add_argument("--no_trace", action="store_true",
                    help="wall-clock only (fast batch sweeps, no profiler)")
    ap.add_argument("--pipeline", action="store_true",
                    help="trace a FULL engine.sample_batch call (text -> "
                         "scan -> VAE -> uint8) instead of the bare UNet "
                         "forward — catches the pipeline-vs-UNet gap "
                         "(~8 ms/step/img unaccounted in the segments)")
    ap.add_argument("--solver", default="dpm++_2m_cfgpp")
    ap.add_argument("--nfe", type=int, default=25)
    ap.add_argument("--guidance", type=float, default=5.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

    bundle = ModelBundle.random_init(args.model, dtype=jnp.bfloat16,
                                     param_dtype=jnp.bfloat16)
    if not args.no_quant:
        bundle = bundle.quantized(mode=args.quant_mode)
    engine = DiffusionEngine(bundle, solver=args.solver, nfe=args.nfe)

    if args.pipeline:
        prompts = [f"profile prompt {i}" for i in range(args.batch)]

        def run_pipe():
            return engine.sample_batch("", prompts, cfg_guidance=args.guidance,
                                       seed=1, resolution=args.res,
                                       to_uint8=True)

        run_pipe()   # compile + warm
        t0 = time.perf_counter()
        run_pipe()   # sample_batch materializes to host already
        wall_ms = (time.perf_counter() - t0) * 1e3
        with jax.profiler.trace(args.logdir):
            run_pipe()
        events = load_trace_events(args.logdir)
        per_op, per_bucket, total, pid_names, tid_names = aggregate(events, 1)
        label = ("bf16" if args.no_quant else f"int8[{args.quant_mode}]")
        print(f"\n=== {args.model} FULL sample_batch b{args.batch} "
              f"{args.res}^2 {args.nfe}-NFE {args.solver} {label}: wall "
              f"{wall_ms:.1f} ms, device-trace total {total:.1f} ms ===")
        print("\n-- buckets (ms) --")
        for b, ms in per_bucket.most_common():
            print(f"{ms:9.2f}  {100*ms/max(total,1e-9):5.1f}%  {b}")
        print(f"\n-- top {args.top} ops --")
        for name, ms in per_op.most_common(args.top):
            print(f"{ms:9.2f}  {name[:110]}")
        print(f"\nwall - device gap: {wall_ms - total:.1f} ms "
              f"(host dispatch / tunnel / python)")
        return

    rows = 2 * args.batch
    lat = engine.latent_shape(args.batch, args.res)
    zt = jnp.zeros((rows,) + lat[1:], jnp.bfloat16)
    tt = jnp.full((rows,), 500, jnp.int32)
    ctx_dim = bundle.config.unet.cross_attention_dim
    ctx = jnp.zeros((rows, 77, ctx_dim), jnp.bfloat16)
    unet_args = [zt, tt, ctx]
    if bundle.config.unet.addition_embed_type == "text_time":
        pooled = jnp.zeros((rows, bundle.config.text_encoder_2.projection_dim))
        tids = jnp.asarray([[args.res, args.res, 0, 0, args.res, args.res]]
                           * rows, jnp.float32)
        unet_args += [pooled, tids]

    fwd = jax.jit(lambda p, *a: bundle.unet.apply(p, *a))

    def run():
        return fwd(bundle.unet_params, *unet_args)

    # wall-clock reference for the same forward
    run()
    jax.device_get(jax.tree.leaves(run())[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    wall_ms = (time.perf_counter() - t0) / args.iters * 1e3

    if args.no_trace:
        label = ("bf16" if args.no_quant else f"int8[{args.quant_mode}]")
        print(f"{args.model} UNet fwd dual-batch-{rows} {args.res}^2 "
              f"{label}: wall {wall_ms:.1f} ms "
              f"({wall_ms/args.batch:.2f} ms/img)")
        return

    capture_trace(args.logdir, run, iters=args.iters)
    events = load_trace_events(args.logdir)
    per_op, per_bucket, total, pid_names, tid_names = aggregate(
        events, args.iters)

    label = ("bf16" if args.no_quant else f"int8[{args.quant_mode}]")
    print(f"\n=== {args.model} UNet fwd dual-batch-{rows} {args.res}^2 "
          f"{label}: wall {wall_ms:.1f} ms, device-trace total "
          f"{total:.1f} ms/iter ===")
    print("\n-- buckets (ms/iter) --")
    for b, ms in per_bucket.most_common():
        print(f"{ms:9.2f}  {100*ms/max(total,1e-9):5.1f}%  {b}")
    print(f"\n-- top {args.top} ops --")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms:9.2f}  {name[:110]}")
    if args.raw:
        print("\n-- lanes --")
        for p, n in pid_names.items():
            print(f"pid {p}: {n}")
        for (p, t), n in list(tid_names.items())[:40]:
            print(f"pid {p} tid {t}: {n}")


if __name__ == "__main__":
    main()
