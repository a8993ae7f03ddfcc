"""Quick TPU liveness/latency probe for the tunneled single-chip setup.

Distinguishes the three failure states seen in practice (round 5) when
the axon tunnel or its remote compile service degrades:

* healthy      — init < 5 s, small-matmul compile+run < 5 s, 12 GB HBM
                 alloc OK: safe to launch big work (bench.py).
* slow-init    — backend init takes minutes: a previous client's lease
                 is still releasing; wait, don't stack more clients.
* exec-wedged  — small ops fine but big programs never return from
                 dispatch (blocked in Array._value): the remote side is
                 draining abandoned work.  Launching more big compiles
                 makes it WORSE — every killed client leaves its remote
                 compile running.  Wait and re-probe.

Usage: python tools/tpu_health.py [--big]
  --big  additionally times one real SDXL-shaped attention forward
         (~2 s healthy) — a mid-size program between the trivial matmul
         and the full pipeline.

Prints one JSON line; exit code 0 iff every probe it ran passed its
threshold.  The probe itself is small enough never to contribute to the
degraded state it measures.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--alloc_gb", type=float, default=12.0)
    args = ap.parse_args()

    out = {}
    ok = True

    t = time.time()
    import jax
    import jax.numpy as jnp
    devs = jax.devices()
    out["init_s"] = round(time.time() - t, 2)
    out["device"] = str(devs[0])
    ok &= out["init_s"] < 30.0

    t = time.time()
    x = jnp.ones((4096, 4096), jnp.bfloat16)
    (x @ x).block_until_ready()
    out["small_matmul_s"] = round(time.time() - t, 2)
    ok &= out["small_matmul_s"] < 30.0

    t = time.time()
    n = int(args.alloc_gb * (1 << 30) / 2)
    try:
        big = jnp.ones((n,), jnp.bfloat16)
        big.block_until_ready()
        out[f"alloc_{args.alloc_gb:g}gb_s"] = round(time.time() - t, 2)
        del big
    except Exception as e:
        out[f"alloc_{args.alloc_gb:g}gb_s"] = None
        out["alloc_error"] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
        ok = False

    if args.big:
        # One SDXL-level-1 attention forward: big enough to exercise the
        # Pallas path + a real remote compile, small enough to finish in
        # seconds when healthy.
        from cfgpp_tpu.kernels.flash_attention import flash_attention
        t = time.time()
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (2, 10, 4096, 64), jnp.bfloat16)
        flash_attention(q, q, q).block_until_ready()
        out["attention_probe_s"] = round(time.time() - t, 2)
        ok &= out["attention_probe_s"] < 120.0

    out["healthy"] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
