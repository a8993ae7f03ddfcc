"""Checkpoint conversion: HF safetensors state dicts -> Flax param pytrees.

Replaces the reference's reliance on `from_pretrained` hub loading
(`latent_diffusion.py:63-69`, `latent_sdxl.py:40-56`).  Handles the HF
diffusers/transformers key layouts for UNet2DConditionModel, AutoencoderKL
and CLIPText models; tensors are transposed from torch conventions
(OIHW convs, [out,in] linears) to Flax NHWC/HWIO.

Layout notes (torch -> flax):
  conv weight  [O,I,kh,kw] -> kernel [kh,kw,I,O]
  linear weight [O,I]      -> kernel [I,O]
  norm weight              -> scale
  token embedding [V,H]    -> embedding [V,H] (unchanged)
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Tuple

import numpy as np


def _conv(x):
    return np.transpose(x, (2, 3, 1, 0))


def _linear(x):
    return np.transpose(x, (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_UNET_BLOCK_RE = re.compile(
    r"^(down_blocks|up_blocks)\.(\d+)\.(resnets|attentions|downsamplers|upsamplers)\.(\d+)\.(.*)$")
_MID_RE = re.compile(r"^mid_block\.(resnets|attentions)\.(\d+)\.(.*)$")


def _leaf(rest: str, value: np.ndarray):
    """Translate an intra-module diffusers suffix to (flax path, tensor)."""
    parts = rest.split(".")
    name, kind = parts[:-1], parts[-1]

    # diffusers wraps attention output in ModuleList: to_out.0 -> to_out
    if len(name) >= 2 and name[-2] == "to_out" and name[-1] == "0":
        name = name[:-1]
    # ff.net.0.proj -> ff/net_0_proj ; ff.net.2 -> ff/net_2
    if "net" in name:
        i = name.index("net")
        tail = "_".join(name[i:])
        name = name[:i] + [tail]
    # transformer_blocks.N -> transformer_blocks_N
    merged = []
    for p in name:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    name = merged

    norm_like = any(n.startswith(("norm", "layer_norm", "group_norm",
                                  "final_layer_norm", "conv_norm_out")) or
                    n in ("norm", "norm1", "norm2", "norm3") for n in name[-1:])
    if kind == "weight":
        if value.ndim == 4:
            return tuple(name) + ("kernel",), _conv(value)
        if value.ndim == 2:
            return tuple(name) + ("kernel",), _linear(value)
        return tuple(name) + ("scale" if norm_like or value.ndim == 1 else "kernel",), value
    if kind == "bias":
        return tuple(name) + ("bias",), value
    raise KeyError(f"unhandled tensor kind {kind!r} in {rest!r}")


def convert_unet(state: Dict[str, np.ndarray]) -> dict:
    """diffusers UNet2DConditionModel state dict -> flax params tree."""
    tree: dict = {}
    for key, value in state.items():
        m = _UNET_BLOCK_RE.match(key)
        if m:
            blk, i, sub, j, rest = m.groups()
            top = f"{blk}_{i}_{sub}_{j}"
            path, v = _leaf(rest, value)
            _set(tree, (top,) + path, v)
            continue
        m = _MID_RE.match(key)
        if m:
            sub, j, rest = m.groups()
            path, v = _leaf(rest, value)
            _set(tree, (f"mid_block_{sub}_{j}",) + path, v)
            continue
        # top-level: conv_in, conv_out, conv_norm_out, time_embedding.linear_1,
        # add_embedding.linear_1, time_proj (no params), ...
        path, v = _leaf(key, value)
        _set(tree, path, v)
    return {"params": tree}


def convert_vae(state: Dict[str, np.ndarray]) -> dict:
    """diffusers AutoencoderKL state dict -> flax params tree.

    Handles both modern attention naming (to_q/to_k/to_v/to_out.0) and the
    legacy one (query/key/value/proj_attn)."""
    legacy = {"query": "to_q", "key": "to_k", "value": "to_v",
              "proj_attn": "to_out"}
    tree: dict = {}
    for key, value in state.items():
        parts = key.split(".")
        parts = [legacy.get(p, p) for p in parts]
        key = ".".join(parts)

        m = re.match(r"^(encoder|decoder)\.(.*)$", key)
        if m:
            side, rest = m.groups()
            mm = re.match(
                r"^(down_blocks|up_blocks)\.(\d+)\.(resnets|downsamplers|upsamplers)\.(\d+)\.(.*)$",
                rest)
            if mm:
                blk, i, sub, j, leaf_rest = mm.groups()
                if sub in ("downsamplers", "upsamplers"):
                    # flattened conv module name: down_blocks_0_downsamplers_0_conv
                    leaf_rest2 = leaf_rest
                    assert leaf_rest2.startswith("conv.")
                    top = f"{blk}_{i}_{sub}_{j}_conv"
                    path, v = _leaf(leaf_rest2[len("conv."):], value)
                    # path here is just ("kernel"/"bias",)
                    _set(tree, (side, top) + path, v)
                else:
                    top = f"{blk}_{i}_{sub}_{j}"
                    path, v = _leaf(leaf_rest, value)
                    _set(tree, (side, top) + path, v)
                continue
            mm = re.match(r"^mid_block\.(resnets|attentions)\.(\d+)\.(.*)$", rest)
            if mm:
                sub, j, leaf_rest = mm.groups()
                path, v = _leaf(leaf_rest, value)
                _set(tree, (side, "mid_block", f"{sub}_{j}") + path, v)
                continue
            path, v = _leaf(rest, value)
            _set(tree, (side,) + path, v)
            continue
        # quant_conv / post_quant_conv
        path, v = _leaf(key, value)
        _set(tree, path, v)
    return {"params": tree}


def convert_clip_text(state: Dict[str, np.ndarray]) -> dict:
    """transformers CLIPTextModel[WithProjection] state dict -> flax params."""
    tree: dict = {}
    for key, value in state.items():
        if key.endswith("position_ids"):
            continue
        if key == "text_model.embeddings.token_embedding.weight":
            _set(tree, ("token_embedding", "embedding"), value)
            continue
        if key == "text_model.embeddings.position_embedding.weight":
            _set(tree, ("position_embedding",), value)
            continue
        if key == "text_projection.weight":
            _set(tree, ("text_projection", "kernel"), _linear(value))
            continue
        m = re.match(r"^text_model\.encoder\.layers\.(\d+)\.(.*)$", key)
        if m:
            i, rest = m.groups()
            path, v = _leaf(rest, value)
            _set(tree, (f"layers_{i}",) + path, v)
            continue
        m = re.match(r"^text_model\.(final_layer_norm)\.(weight|bias)$", key)
        if m:
            name, kind = m.groups()
            _set(tree, (name, "scale" if kind == "weight" else "bias"), value)
            continue
        # combined CLIPModel checkpoints (e.g. openai/clip-vit-large-
        # patch14 model.safetensors) carry BOTH towers + logit_scale; the
        # text converter must skip the vision half instead of crashing
        if key.startswith(("vision_model.", "visual_projection")) \
                or key == "logit_scale":
            continue
        raise KeyError(f"unhandled CLIP key: {key}")
    if not tree:
        raise KeyError("no text_model.* keys found in the CLIP state dict")
    return {"params": tree}


def convert_clip_vision(state: Dict[str, np.ndarray]) -> dict:
    """transformers CLIPVisionModelWithProjection state dict -> flax params."""
    tree: dict = {}
    for key, value in state.items():
        if key.endswith("position_ids"):
            continue
        if key == "vision_model.embeddings.class_embedding":
            _set(tree, ("class_embedding",), value)
            continue
        if key == "vision_model.embeddings.patch_embedding.weight":
            _set(tree, ("patch_embedding", "kernel"), _conv(value))
            continue
        if key == "vision_model.embeddings.position_embedding.weight":
            _set(tree, ("position_embedding",), value)
            continue
        if key == "visual_projection.weight":
            _set(tree, ("visual_projection", "kernel"), _linear(value))
            continue
        m = re.match(r"^vision_model\.encoder\.layers\.(\d+)\.(.*)$", key)
        if m:
            i, rest = m.groups()
            path, v = _leaf(rest, value)
            _set(tree, (f"layers_{i}",) + path, v)
            continue
        m = re.match(r"^vision_model\.(pre_layrnorm|post_layernorm)\.(weight|bias)$", key)
        if m:
            name, kind = m.groups()
            _set(tree, (name, "scale" if kind == "weight" else "bias"), value)
            continue
        # combined CLIPModel checkpoints carry both towers + logit_scale
        if key.startswith(("text_model.", "text_projection")) \
                or key == "logit_scale":
            continue
        raise KeyError(f"unhandled CLIP vision key: {key}")
    if not tree:
        raise KeyError("no vision_model.* keys found in the CLIP state dict")
    return {"params": tree}


# ---------------------------------------------------------------------------
# structural validation + bundle loading
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def validate_structure(converted: dict, expected: dict, what: str) -> None:
    """Converted tree must exactly match the module's init structure."""
    import jax
    got = _flatten(converted)
    want = _flatten(jax.tree.map(lambda x: np.asarray(x), expected))
    missing = sorted(set(map(str, set(want) - set(got))))[:10]
    extra = sorted(set(map(str, set(got) - set(want))))[:10]
    if missing or extra:
        raise ValueError(f"{what}: converted params mismatch; "
                         f"missing={missing} extra={extra}")
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    if bad:
        raise ValueError(f"{what}: shape mismatches (first 5): {bad[:5]}")


def _read_safetensors_dir(path: Path) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    state: Dict[str, np.ndarray] = {}
    for f in sorted(path.glob("*.safetensors")):
        state.update(load_file(str(f)))
    if not state:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return state


def load_bundle_params(bundle, checkpoint_dir: str):
    """Populate a bundle's params from an HF-layout checkpoint directory
    (subdirs: unet/, vae/, text_encoder/, text_encoder_2/)."""
    import jax

    root = Path(checkpoint_dir)

    def cast_like(converted, reference):
        return jax.tree.map(
            lambda c, r: np.asarray(c).astype(r.dtype), converted, reference)

    unet = convert_unet(_read_safetensors_dir(root / "unet"))
    validate_structure(unet, bundle.unet_params, "unet")
    bundle.unet_params = cast_like(unet, bundle.unet_params)

    vae = convert_vae(_read_safetensors_dir(root / "vae"))
    validate_structure(vae, bundle.vae_params, "vae")
    bundle.vae_params = cast_like(vae, bundle.vae_params)

    text = convert_clip_text(_read_safetensors_dir(root / "text_encoder"))
    validate_structure(text, bundle.text_params, "text_encoder")
    bundle.text_params = cast_like(text, bundle.text_params)

    if bundle.text_encoder_2 is not None:
        text2 = convert_clip_text(_read_safetensors_dir(root / "text_encoder_2"))
        validate_structure(text2, bundle.text_params_2, "text_encoder_2")
        bundle.text_params_2 = cast_like(text2, bundle.text_params_2)
    return bundle
