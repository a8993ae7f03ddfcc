"""CLIP-score: prompt <-> generated-image cosine similarity.

Named in the build north star (BASELINE.json: "MS-COCO 10k FID /
CLIP-score"); the reference repo never computes it (its paper numbers came
from elsewhere), so this is a capability add, not a port.  Definition
follows the standard CLIPScore (Hessel et al. 2021 / torchmetrics):

    score = mean_i  100 * max(0, cos(E_text(prompt_i), E_img(image_i)))

using the OpenAI CLIP ViT-L/14 text and vision towers already implemented
for SD conditioning (`models/clip.py`, `models/clip_vision.py`) — one
checkpoint, both projections.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _load_state(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def clip_text_features(prompts: Sequence[str], clip_ckpt: str,
                       batch: int = 256) -> np.ndarray:
    """Prompts -> [N, projection_dim] L2-normalized text embeddings."""
    import jax
    import jax.numpy as jnp

    from cfgpp_tpu.configs import CLIPTextConfig
    from cfgpp_tpu.models.clip import CLIPTextModel
    from cfgpp_tpu.weights.convert import convert_clip_text
    from cfgpp_tpu.weights.tokenizer import load_tokenizer

    state = _load_state(clip_ckpt)
    cfg = CLIPTextConfig(projection_dim=768)
    model = CLIPTextModel(cfg)
    params = convert_clip_text(state)
    tok = load_tokenizer(None, vocab_size=cfg.vocab_size,
                         eos_token_id=cfg.eos_token_id)
    apply = jax.jit(lambda ids: model.apply(params, ids).pooled_output)
    feats = []
    for i in range(0, len(prompts), batch):
        ids = jnp.asarray(tok(list(prompts[i:i + batch])))
        feats.append(np.asarray(apply(ids)))
    out = np.concatenate(feats)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def clip_image_features(paths: Sequence[str], clip_ckpt: str,
                        batch: int = 64) -> np.ndarray:
    """Image files -> [N, projection_dim] L2-normalized image embeddings."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from cfgpp_tpu.models.clip_vision import (CLIPVisionConfig, CLIPVisionModel,
                                              preprocess_for_clip)
    from cfgpp_tpu.weights.convert import convert_clip_vision

    state = _load_state(clip_ckpt)
    model = CLIPVisionModel(CLIPVisionConfig())
    params = convert_clip_vision(state)
    apply = jax.jit(lambda px: model.apply(params, px))
    feats = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([
            np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            for p in paths[i:i + batch]])
        feats.append(np.asarray(apply(preprocess_for_clip(jnp.asarray(imgs)))))
    out = np.concatenate(feats)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def clip_score_from_features(text_feats: np.ndarray,
                             image_feats: np.ndarray) -> float:
    """Paired, already-normalized features -> mean 100*max(0, cos)."""
    if text_feats.shape != image_feats.shape:
        raise ValueError(
            f"feature shapes differ: {text_feats.shape} vs {image_feats.shape}")
    cos = np.sum(text_feats * image_feats, axis=-1)
    return float(np.mean(100.0 * np.clip(cos, 0.0, None)))


def clip_score(prompts: Sequence[str], image_paths: Sequence[str],
               clip_ckpt: str) -> float:
    if len(prompts) != len(image_paths):
        raise ValueError(
            f"{len(prompts)} prompts vs {len(image_paths)} images")
    t = clip_text_features(prompts, clip_ckpt)
    v = clip_image_features(image_paths, clip_ckpt)
    return clip_score_from_features(t, v)
