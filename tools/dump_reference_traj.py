#!/usr/bin/env python
"""Dump a per-step latent trajectory from the PyTorch/CUDA reference repo.

Run this on any GPU box that can run the reference (CFGpp) repo — it is NOT
runnable in the TPU build environment (no diffusers/weights/network there).
The produced .npz is the input to `python -m cfgpp_tpu.cli.parity_check`,
which replays the identical zT (and, for inversion, the identical encoded
source latent) through the TPU engine and reports per-step latent MAE
against the < 1e-2 gate.

Usage (from a checkout of the reference repo's parent dir):

  python tools/dump_reference_traj.py --reference_repo /path/to/CFGpp \\
      --method ddim_cfg++ --model sd15 --NFE 50 --cfg_guidance 0.6 \\
      --prompt "a photo of a cat" --out ref_traj.npz

  # inversion / reconstruction parity:
  python tools/dump_reference_traj.py --reference_repo /path/to/CFGpp \\
      --method ddim_inversion_cfg++ --NFE 10 --cfg_guidance 0.6 \\
      --prompt "a cat" --src_img photo.png --out ref_inv.npz

  # word-swap editing parity:
  python tools/dump_reference_traj.py ... --method ddim_edit_cfg++ \\
      --prompt "a dog" --src_prompt "a cat" --src_img photo.png

The dump captures:
  zT      the exact initial latent the reference drew (NHWC f32)
  z0t/zt  every step's Tweedie estimate and renoised latent (reverse pass)
  src_latent  (inversion/edit only) the encoded source latent BEFORE the
          forward inversion loop, so the jax side can bypass its own VAE
          sampling draw
plus the run configuration, so the jax side rebuilds the identical solver.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def to_nhwc(x) -> np.ndarray:
    return np.transpose(x.detach().float().cpu().numpy(), (0, 2, 3, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference_repo", required=True,
                   help="path to the CFGpp reference checkout")
    p.add_argument("--method", default="ddim_cfg++")
    p.add_argument("--model", default="sd15", choices=("sd15", "sdxl"))
    p.add_argument("--NFE", type=int, default=50)
    p.add_argument("--cfg_guidance", type=float, default=0.6)
    p.add_argument("--prompt", default="a photo of a cat")
    p.add_argument("--null_prompt", default="")
    p.add_argument("--src_prompt", default=None,
                   help="edit solvers: source prompt (word-swap origin)")
    p.add_argument("--src_img", default=None,
                   help="inversion/edit solvers: path to the source image")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--device", default="cuda")
    p.add_argument("--out", default="ref_traj.npz")
    args = p.parse_args()

    sys.path.insert(0, args.reference_repo)
    import torch
    from munch import munchify

    torch.manual_seed(args.seed)
    torch.cuda.manual_seed_all(args.seed)
    np.random.seed(args.seed)

    solver_config = munchify({"num_sampling": args.NFE})
    if args.model == "sdxl":
        from latent_sdxl import get_solver
        solver = get_solver(args.method, solver_config=solver_config,
                            device=args.device)
    else:
        from latent_diffusion import get_solver
        solver = get_solver(args.method, solver_config=solver_config,
                            device=args.device)

    # --- capture hooks -----------------------------------------------------
    z0s, zts = [], []

    def callback_fn(step, t, callback_kwargs):
        z0s.append(to_nhwc(callback_kwargs["z0t"]))
        zts.append(to_nhwc(callback_kwargs["zt"]))
        return callback_kwargs

    captured = {}

    # The reference draws zT inside sample(); intercept initialize_latent to
    # record exactly what it returned (and the encoded latent for inversion).
    orig_init = solver.initialize_latent

    def hooked_init(method="random", src_img=None, **kw):
        if src_img is not None and hasattr(solver, "encode"):
            with torch.no_grad():
                captured["src_latent"] = to_nhwc(solver.encode(src_img))
        z = orig_init(method=method, src_img=src_img, **kw)
        captured["zT"] = to_nhwc(z)
        return z

    solver.initialize_latent = hooked_init

    kwargs = {"cfg_guidance": args.cfg_guidance, "callback_fn": callback_fn}
    if args.src_img is not None:
        from PIL import Image
        img = Image.open(args.src_img).convert("RGB")
        size = 1024 if args.model == "sdxl" else 512
        img = img.resize((size, size))
        x = torch.from_numpy(np.asarray(img, np.float32) / 127.5 - 1.0)
        kwargs["src_img"] = x.permute(2, 0, 1)[None].to(args.device)

    if args.src_prompt is not None:  # edit: [null, src, tgt]
        prompts = [args.null_prompt, args.src_prompt, args.prompt]
    else:
        prompts = [args.null_prompt, args.prompt]

    if args.model == "sdxl":
        solver.sample(prompt1=prompts, prompt2=prompts, **kwargs)
    else:
        solver.sample(prompt=prompts, **kwargs)

    kind = ("edit" if args.src_prompt is not None
            else "inversion" if args.src_img is not None else "t2i")
    out = {
        "zT": captured["zT"],
        "z0t": np.stack(z0s), "zt": np.stack(zts),
        "prompt": args.prompt, "null_prompt": args.null_prompt,
        "cfg_guidance": args.cfg_guidance, "nfe": args.NFE,
        "method": args.method, "model": args.model, "kind": kind,
        "seed": args.seed,
    }
    if args.src_prompt is not None:
        out["src_prompt"] = args.src_prompt
    if "src_latent" in captured:
        out["src_latent"] = captured["src_latent"]
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: kind={kind} steps={len(z0s)} "
          f"zT{captured['zT'].shape}")


if __name__ == "__main__":
    main()
