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

import functools
from typing import Optional, Sequence

import numpy as np


@functools.lru_cache(maxsize=1)
def _load_state(path: str):
    """One checkpoint load per process: the CLI touches the CLIP weights
    for CLIP-FID, CLIP-score images AND text (shared loader with the
    Inception tower)."""
    from cfgpp_tpu.metrics.inception import _load_state_dict
    return _load_state_dict(path)


def clip_text_features(prompts: Sequence[str], clip_ckpt: str,
                       tokenizer_dir: Optional[str] = None,
                       batch: int = 256) -> np.ndarray:
    """Prompts -> [N, projection_dim] L2-normalized text embeddings.

    Requires a REAL CLIP tokenizer (``tokenizer_dir`` or
    $CFGPP_TOKENIZER_DIR with vocab.json + merges.txt): with real weights,
    the hash-fallback tokenizer would produce numerically plausible but
    meaningless scores, so it is rejected here."""
    import jax
    import jax.numpy as jnp

    from cfgpp_tpu.configs import CLIPTextConfig
    from cfgpp_tpu.models.clip import CLIPTextModel
    from cfgpp_tpu.weights.convert import convert_clip_text
    from cfgpp_tpu.weights.tokenizer import HashTokenizer, load_tokenizer

    state = _load_state(clip_ckpt)
    cfg = CLIPTextConfig(projection_dim=768)
    model = CLIPTextModel(cfg)
    params = convert_clip_text(state)
    tok = load_tokenizer(tokenizer_dir, vocab_size=cfg.vocab_size,
                         eos_token_id=cfg.eos_token_id)
    if isinstance(tok, HashTokenizer):
        raise ValueError(
            "CLIP-score needs the real CLIP BPE tokenizer: pass "
            "tokenizer_dir (or set $CFGPP_TOKENIZER_DIR) pointing at "
            "vocab.json + merges.txt.  Refusing the hash-fallback "
            "tokenizer, which would silently produce meaningless scores "
            "against real checkpoint weights.")
    apply = jax.jit(lambda ids: model.apply(params, ids).pooled_output)
    feats = []
    for i in range(0, len(prompts), batch):
        ids = jnp.asarray(tok(list(prompts[i:i + batch])))
        feats.append(np.asarray(apply(ids)))
    out = np.concatenate(feats)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


@functools.lru_cache(maxsize=2)
def _cached_vision_extractor(clip_ckpt: str):
    """Load + convert + jit the CLIP vision tower once per checkpoint: a
    CLIP-FID run extracts features for BOTH directories."""
    import jax

    from cfgpp_tpu.models.clip_vision import (CLIPVisionConfig,
                                              CLIPVisionModel)
    from cfgpp_tpu.weights.convert import convert_clip_vision

    state = _load_state(clip_ckpt)
    model = CLIPVisionModel(CLIPVisionConfig())
    params = convert_clip_vision(state)
    return jax.jit(lambda px: model.apply(params, px))


def clip_image_features(paths: Sequence[str], clip_ckpt: str,
                        batch: int = 64) -> np.ndarray:
    """Image files -> [N, projection_dim] L2-normalized image embeddings.

    Preprocessing matches the CLIP processor exactly: resize the SHORTEST
    side to 224 (bicubic), then center-crop 224x224 — not a squash-resize —
    so scores on non-square inputs (raw MS-COCO references) are comparable
    to torchmetrics / clean-fid numbers.  Features are L2-normalized here;
    CLIP-FID consumers therefore get normalized embeddings (the clean-fid
    convention), which shifts clip_fid scale vs unnormalized variants.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from cfgpp_tpu.models.clip_vision import (CLIPVisionConfig, CLIPVisionModel,
                                              preprocess_for_clip)
    from cfgpp_tpu.weights.convert import convert_clip_vision

    apply = _cached_vision_extractor(str(clip_ckpt))

    def load224(p):
        im = Image.open(p).convert("RGB")
        if im.size != (224, 224):
            w, h = im.size
            scale = 224.0 / min(w, h)
            # round like torchvision Resize (shortest side exactly 224)
            nw, nh = (224, max(224, round(h * scale))) if w <= h else \
                (max(224, round(w * scale)), 224)
            im = im.resize((nw, nh), Image.BICUBIC)
            left = (nw - 224) // 2
            top = (nh - 224) // 2
            im = im.crop((left, top, left + 224, top + 224))
        return np.asarray(im, np.float32) / 255.0

    feats = []
    for i in range(0, len(paths), batch):
        imgs = np.stack([load224(p) for p in paths[i:i + batch]])
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
               clip_ckpt: str, tokenizer_dir: Optional[str] = None) -> float:
    if len(prompts) != len(image_paths):
        raise ValueError(
            f"{len(prompts)} prompts vs {len(image_paths)} images")
    t = clip_text_features(prompts, clip_ckpt, tokenizer_dir=tokenizer_dir)
    v = clip_image_features(image_paths, clip_ckpt)
    return clip_score_from_features(t, v)
