"""Per-step latent parity harness vs a PyTorch/diffusers reference run.

The build target demands per-step latent MAE < 1e-2 against the reference
(BASELINE.md).  This environment cannot run diffusers, so the check is
shipped as an executable harness: dump a reference trajectory on any GPU
box, then run this CLI to compare step-for-step.

Reference dump format (one .npz, produced by tools/dump_reference_traj.py
on any GPU box with the reference repo + diffusers):
  zT          [B,H,W,C]  initial latent, NHWC float32 (torch: NCHW->NHWC)
  z0t         [n,B,H,W,C] per-step Tweedie estimates (reverse pass)
  zt          [n,B,H,W,C] per-step renoised latents
  prompt / null_prompt / cfg_guidance / nfe / method / model
  kind        "t2i" | "inversion" | "edit"
  src_latent  (inversion/edit) the reference's encoded source latent —
              injected here to bypass the jax VAE sampling draw
  src_prompt  (edit) word-swap source prompt

For t2i dumps the reference zT is injected; for inversion/edit dumps the
jax side re-runs the FULL forward-inversion + reverse pass from the
reference's src_latent, so inversion-loop divergence surfaces in the
step-0 MAE of the reverse trajectory.

Usage:
  python -m cfgpp_tpu.cli.parity_check --dump ref_traj.npz --ckpt_dir <weights>
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def compare_trajectories(ours_z0, ours_zt, ref_z0, ref_zt):
    n = min(len(ours_z0), len(ref_z0))
    rows = []
    for i in range(n):
        rows.append({
            "step": i,
            "mae_z0t": float(np.mean(np.abs(ours_z0[i] - ref_z0[i]))),
            "mae_zt": float(np.mean(np.abs(ours_zt[i] - ref_zt[i]))),
        })
    worst = max(max(r["mae_z0t"], r["mae_zt"]) for r in rows)
    return rows, worst


def main(argv=None):
    parser = argparse.ArgumentParser(description="cfgpp_tpu latent parity check")
    parser.add_argument("--dump", type=str, required=True,
                        help=".npz reference trajectory (see module docstring)")
    parser.add_argument("--ckpt_dir", type=str, required=True,
                        help="converted reference weights (HF layout)")
    parser.add_argument("--tolerance", type=float, default=1e-2)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=("bfloat16", "float32"))
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

    ref = np.load(args.dump, allow_pickle=True)
    model = str(ref["model"])
    method = str(ref["method"])
    nfe = int(ref["nfe"])
    w = float(ref["cfg_guidance"])

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = ModelBundle.from_pretrained(args.ckpt_dir, model,
                                         dtype=dtype, param_dtype=dtype)
    engine = DiffusionEngine(bundle, solver=method, nfe=nfe)

    res = ref["zT"].shape[1] * bundle.vae_scale_factor
    kind = str(ref["kind"]) if "kind" in ref else "t2i"
    kw = {}
    if kind == "edit":
        prompt = [str(ref["null_prompt"]), str(ref["src_prompt"]),
                  str(ref["prompt"])]
    else:
        prompt = [str(ref["null_prompt"]), str(ref["prompt"])]
    if kind in ("inversion", "edit"):
        kw["src_latent_override"] = ref["src_latent"]
        # placeholder src_img (the encode it feeds is overridden)
        kw["src_img"] = np.zeros((1, res, res, 3), np.float32)
    else:
        kw["init_latent_override"] = ref["zT"]
    _img, (z0s, zts) = engine.sample(
        prompt=prompt,
        cfg_guidance=w,
        resolution=res,
        return_trajectory=True,
        **kw,
    )

    rows, worst = compare_trajectories(z0s, zts, ref["z0t"], ref["zt"])
    verdict = "PASS" if worst < args.tolerance else "FAIL"
    print(json.dumps({"verdict": verdict, "worst_mae": worst,
                      "tolerance": args.tolerance, "per_step": rows}))
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())
