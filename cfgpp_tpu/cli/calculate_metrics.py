"""Offline image-quality metrics CLI (parity: utils/calculate_metrics.py).

Walks two directories of same-named PNGs and reports paired metrics
(PSNR, MSE, optionally LPIPS) plus distribution metrics (FID / CLIP-score)
when the required feature-extractor weights are supplied:

  python -m cfgpp_tpu.cli.calculate_metrics --input_dir A --label_dir B

Weight-gated metrics name their missing dependency instead of silently
skipping.  The reference's broken MSE/MNC classes
(calculate_metrics.py:134,190-195) are fixed here, not propagated.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from cfgpp_tpu.metrics import fid_from_features, mse, psnr
from cfgpp_tpu.utils import get_logger


def _list_images(d: Path):
    return sorted(p for p in d.iterdir() if p.suffix.lower() in (".png", ".jpg", ".jpeg"))


def _load(path: Path) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32)


def paired_metrics(input_dir: Path, label_dir: Path, logger):
    ins, labs = _list_images(input_dir), _list_images(label_dir)
    if len(ins) != len(labs):
        logger.warning("directory sizes differ: %d vs %d; using min",
                       len(ins), len(labs))
    n = min(len(ins), len(labs))
    psnrs, mses = [], []
    for a, b in zip(ins[:n], labs[:n]):
        ia, ib = _load(a), _load(b)
        if ia.shape != ib.shape:
            raise ValueError(f"shape mismatch {a.name}: {ia.shape} vs {ib.shape}")
        psnrs.append(psnr(ia, ib, data_range=255.0))
        mses.append(mse(ia, ib))
    return {"psnr": float(np.mean(psnrs)), "mse": float(np.mean(mses)), "n_pairs": n}


def clip_features(paths, clip_ckpt: str, batch: int = 32) -> np.ndarray:
    """Image embeddings from the CLIP vision tower (for CLIP-FID / CLIP-score)."""
    import jax.numpy as jnp

    from cfgpp_tpu.models.clip_vision import (CLIPVisionConfig, CLIPVisionModel,
                                              preprocess_for_clip)
    from cfgpp_tpu.weights.convert import convert_clip_vision
    from safetensors.numpy import load_file

    model = CLIPVisionModel(CLIPVisionConfig())
    params = convert_clip_vision(load_file(clip_ckpt))
    import jax
    apply = jax.jit(lambda px: model.apply(params, px))
    feats = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([_load(p) / 255.0 for p in paths[i:i + batch]])
        feats.append(np.asarray(apply(preprocess_for_clip(jnp.asarray(imgs)))))
    return np.concatenate(feats)


def main(argv=None):
    parser = argparse.ArgumentParser(description="cfgpp_tpu metrics")
    parser.add_argument("--input_dir", type=Path, required=True)
    parser.add_argument("--label_dir", type=Path, required=True)
    parser.add_argument("--clip_ckpt", type=str, default=None,
                        help="safetensors CLIP vision weights; enables "
                             "CLIP-FID between the two directories")
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args(argv)

    logger = get_logger("metrics")
    results = paired_metrics(args.input_dir, args.label_dir, logger)

    if args.clip_ckpt:
        a = clip_features(_list_images(args.input_dir), args.clip_ckpt)
        b = clip_features(_list_images(args.label_dir), args.clip_ckpt)
        results["clip_fid"] = fid_from_features(a, b)
    else:
        results["clip_fid"] = None
        logger.info("CLIP-FID skipped: pass --clip_ckpt with CLIP vision weights")
    results["lpips"] = None
    logger.info("LPIPS requires VGG16+LPIPS weights (none baked in this env); "
                "see cfgpp_tpu.metrics.lpips")

    logger.info("metrics: %s", results)
    print(json.dumps(results))
    if args.out:
        args.out.write_text(json.dumps(results))


if __name__ == "__main__":
    main()
