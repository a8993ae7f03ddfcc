"""MS-COCO eval generation CLI.

Replaces the reference's serial 10k-prompt loop
(`examples/text_to_mscoco.py:54-62`) with sharded batch generation over a
device mesh: prompts are tokenized on the host, split into batches of
``--batch_size``, and each batch runs as ONE fused jit with the batch dim
sharded data-parallel across chips.  Per-sample RNG is keyed by the GLOBAL
prompt index, so output i is identical for any batch size / chip count.

Fixes two reference quirks (SURVEY.md 'quirks'): non-SDXL models generate
too (the reference silently produced nothing for sd15), and finished images
are skipped on resume (`--resume`).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from cfgpp_tpu.cli.common import add_common_args, build_engine
from cfgpp_tpu.utils import create_workdir


def read_prompts(path: str, limit: int) -> list:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(line)
    return out[:limit]


def main(argv=None):
    parser = argparse.ArgumentParser(description="cfgpp_tpu MS-COCO generation")
    add_common_args(parser, default_method="ddim", default_nfe=50)
    parser.add_argument("--prompt_dir", type=str, required=True,
                        help="text file, one prompt per line (e.g. coco_v2.txt)")
    parser.add_argument("--num_prompts", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="global batch; sharded over the device mesh")
    parser.add_argument("--no_mesh", action="store_true",
                        help="disable data-parallel sharding")
    parser.add_argument("--resume", action="store_true",
                        help="skip prompts whose output PNG already exists")
    parser.add_argument("--callbacks", type=str, nargs="*", default=None,
                        help="per-step visual callbacks, e.g. draw_noisy "
                             "draw_tweedie (the reference wires both at "
                             "frequency 1 into eval generation, "
                             "examples/text_to_mscoco.py:43-45); images land "
                             "in <workdir>/record/<global_idx>/...")
    parser.add_argument("--callback_frequency", type=int, default=1)
    args = parser.parse_args(argv)

    workdir = Path(args.workdir or "workdir/mscoco")
    create_workdir(workdir)

    prompts = read_prompts(args.prompt_dir, args.num_prompts)
    engine = build_engine(args)

    callback = None
    if args.callbacks:
        from cfgpp_tpu.engine.callbacks import ComposeCallback
        callback = ComposeCallback(workdir=workdir, callbacks=args.callbacks,
                                   frequency=args.callback_frequency)

    mesh = None
    if not args.no_mesh:
        import jax
        from cfgpp_tpu.parallel import make_mesh
        n_dev = len(jax.devices())
        if args.batch_size % n_dev == 0 and n_dev > 1:
            mesh = make_mesh()
            print(f"data-parallel over {n_dev} devices")

    from cfgpp_tpu.native import AsyncPngWriter

    bs = args.batch_size
    t0 = time.time()
    done = 0
    with AsyncPngWriter(n_threads=8) as writer:
        if writer.is_native:
            print("native async PNG writer active")

        def flush_pending(pending):
            """Pull the previous batch to host + hand to the async writer —
            runs while the NEXT batch computes on device."""
            if pending is None:
                return 0
            dev_imgs, paths = pending
            import numpy as _np
            imgs = _np.asarray(dev_imgs)
            for img, p in zip(imgs, paths):
                writer.submit(p, img)
            return len(paths)

        pending = None
        for start in range(0, len(prompts), bs):
            chunk = prompts[start:start + bs]
            indices = list(range(start, start + len(chunk)))
            paths = [workdir / f"{i:05d}.png" for i in indices]
            if args.resume and all(p.exists() for p in paths):
                continue
            # pad the tail chunk to the full batch so the jit cache stays warm
            pad = bs - len(chunk)
            run_prompts = chunk + [""] * pad
            run_indices = indices + list(range(start + len(chunk), start + bs))
            # dispatch is async: this returns as soon as the work is enqueued
            dev_imgs = engine.sample_batch(
                null_prompt=args.null_prompt,
                prompts=run_prompts,
                cfg_guidance=args.cfg_guidance,
                seed=args.seed,
                resolution=args.resolution,
                sample_indices=run_indices,
                mesh=mesh,
                as_numpy=False,
                to_uint8=True,
                callback_fn=callback,
            )
            done += flush_pending(pending)   # overlaps with device compute
            pending = (dev_imgs[: len(chunk)], paths)
            if done:
                dt = time.time() - t0
                print(f"[{done}/{len(prompts)}] {done / dt:.3f} img/s", flush=True)
        done += flush_pending(pending)
        failed = writer.wait()
        if failed:
            print(f"WARNING: {failed} image writes failed")
            done -= failed          # count only images actually on disk

    stats = {"num_images": done, "seconds": time.time() - t0,
             "images_per_sec": done / max(time.time() - t0, 1e-9)}
    with open(workdir / "generation_stats.json", "w") as f:
        json.dump(stats, f)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
