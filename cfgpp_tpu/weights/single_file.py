"""Single-file (SGM/LDM-layout) checkpoint converter.

SDXL-Lightning ships as ONE safetensors file in the original
StabilityAI/SGM key layout (`model.diffusion_model.*`,
`first_stage_model.*`, `conditioner.embedders.*`); the reference loads it via
diffusers `from_single_file` (`latent_sdxl.py:390`).  This module converts
that layout directly into our Flax param trees, deriving the block-index
structure from the UNetConfig (SGM flattens the UNet into sequentially
numbered `input_blocks`/`output_blocks`).

Key structural mappings (SGM -> ours):
  time_embed.0 / .2                  -> time_embedding.linear_1 / linear_2
  label_emb.0.0 / .0.2               -> add_embedding.linear_1 / linear_2
  input_blocks.0.0                   -> conv_in
  input_blocks.k.0  (resnet)         -> down_blocks_i_resnets_j
    in_layers.0/.2, emb_layers.1, out_layers.0/.3, skip_connection
    -> norm1/conv1, time_emb_proj, norm2/conv2, conv_shortcut
  input_blocks.k.1  (transformer)    -> down_blocks_i_attentions_j
  input_blocks.k.0.op (downsample)   -> down_blocks_i_downsamplers_0.conv
  middle_block.0/1/2                 -> mid_block_resnets_0 / attentions_0 / resnets_1
  output_blocks.k.0 (resnet)         -> up_blocks_i_resnets_j
  output_blocks.k.<last>.conv (ups)  -> up_blocks_i_upsamplers_0.conv
  out.0 / out.2                      -> conv_norm_out / conv_out

VAE (first_stage_model): ldm naming (down.N.block.M, mid.block_1/attn_1/
block_2, nin_shortcut, decoder.up REVERSED) -> our encoder/decoder trees.

Text encoders: embedders.0 is HF-CLIP-named (reuse convert_clip_text);
embedders.1 is OpenCLIP-named (resblocks, fused in_proj qkv, ln_f) and is
remapped here, including splitting in_proj into q/k/v and keeping the
`text_projection` PARAMETER orientation (x @ W — no transpose, unlike
nn.Linear weights).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from cfgpp_tpu.configs import ModelBundleConfig, UNetConfig
from cfgpp_tpu.weights.convert import _conv, _leaf, _linear, _set


def _resnet_leaf(rest: str, value: np.ndarray):
    ren = {"in_layers.0": "norm1", "in_layers.2": "conv1",
           "emb_layers.1": "time_emb_proj",
           "out_layers.0": "norm2", "out_layers.3": "conv2",
           "skip_connection": "conv_shortcut"}
    for sgm, ours in ren.items():
        if rest.startswith(sgm + "."):
            kind = rest[len(sgm) + 1:]
            v = value
            if kind == "weight":
                if v.ndim == 4:
                    return (ours, "kernel"), _conv(v)
                if v.ndim == 2:
                    return (ours, "kernel"), _linear(v)
                return (ours, "scale"), v
            return (ours, "bias"), v
    raise KeyError(f"unhandled SGM resnet key: {rest}")


def _unet_layout(cfg: UNetConfig):
    """Sequential SGM block ids -> (our block name, kind) for input/output."""
    n_levels = len(cfg.block_out_channels)
    inputs = {}   # sgm idx -> list of (inner_idx, target_prefix)
    idx = 1
    for i, btype in enumerate(cfg.down_block_types):
        has_attn = btype == "CrossAttnDownBlock2D"
        for j in range(cfg.layers_per_block):
            inputs[idx] = ("block", i, j, has_attn)
            idx += 1
        if i < n_levels - 1:
            inputs[idx] = ("down", i, 0, False)
            idx += 1
    outputs = {}
    idx = 0
    for i, btype in enumerate(cfg.up_block_types):
        has_attn = btype == "CrossAttnUpBlock2D"
        for j in range(cfg.layers_per_block + 1):
            has_up = (i < n_levels - 1) and (j == cfg.layers_per_block)
            outputs[idx] = ("block", i, j, has_attn, has_up)
            idx += 1
    return inputs, outputs


def convert_sgm_unet(state: Dict[str, np.ndarray], cfg: UNetConfig) -> dict:
    inputs, outputs = _unet_layout(cfg)
    tree: dict = {}
    for key, value in state.items():
        if not key.startswith("model.diffusion_model."):
            continue
        k = key[len("model.diffusion_model."):]

        m = re.match(r"^time_embed\.(0|2)\.(weight|bias)$", k)
        if m:
            which = "linear_1" if m.group(1) == "0" else "linear_2"
            kind = "kernel" if m.group(2) == "weight" else "bias"
            v = _linear(value) if kind == "kernel" else value
            _set(tree, ("time_embedding", which, kind), v)
            continue
        m = re.match(r"^label_emb\.0\.(0|2)\.(weight|bias)$", k)
        if m:
            which = "linear_1" if m.group(1) == "0" else "linear_2"
            kind = "kernel" if m.group(2) == "weight" else "bias"
            v = _linear(value) if kind == "kernel" else value
            _set(tree, ("add_embedding", which, kind), v)
            continue
        m = re.match(r"^input_blocks\.0\.0\.(weight|bias)$", k)
        if m:
            kind = "kernel" if m.group(1) == "weight" else "bias"
            _set(tree, ("conv_in", kind), _conv(value) if kind == "kernel" else value)
            continue
        m = re.match(r"^input_blocks\.(\d+)\.(\d+)\.(.*)$", k)
        if m:
            sgm_idx, inner, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            kind_entry = inputs[sgm_idx]
            what, lvl, j, has_attn = kind_entry
            if what == "down":
                assert rest.startswith("op.")
                path, v = _leaf(rest[len("op."):], value)
                _set(tree, (f"down_blocks_{lvl}_downsamplers_0", "conv") + path, v)
            elif inner == 0:
                path, v = _resnet_leaf(rest, value)
                _set(tree, (f"down_blocks_{lvl}_resnets_{j}",) + path, v)
            else:
                path, v = _leaf(rest, value)
                _set(tree, (f"down_blocks_{lvl}_attentions_{j}",) + path, v)
            continue
        m = re.match(r"^middle_block\.(0|1|2)\.(.*)$", k)
        if m:
            which, rest = m.group(1), m.group(2)
            if which == "1":
                path, v = _leaf(rest, value)
                _set(tree, ("mid_block_attentions_0",) + path, v)
            else:
                path, v = _resnet_leaf(rest, value)
                name = "mid_block_resnets_0" if which == "0" else "mid_block_resnets_1"
                _set(tree, (name,) + path, v)
            continue
        m = re.match(r"^output_blocks\.(\d+)\.(\d+)\.(.*)$", k)
        if m:
            sgm_idx, inner, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            what, lvl, j, has_attn, has_up = outputs[sgm_idx]
            up_inner = (2 if has_attn else 1)
            if has_up and inner == up_inner:
                assert rest.startswith("conv.")
                path, v = _leaf(rest[len("conv."):], value)
                _set(tree, (f"up_blocks_{lvl}_upsamplers_0", "conv") + path, v)
            elif inner == 0:
                path, v = _resnet_leaf(rest, value)
                _set(tree, (f"up_blocks_{lvl}_resnets_{j}",) + path, v)
            else:
                path, v = _leaf(rest, value)
                _set(tree, (f"up_blocks_{lvl}_attentions_{j}",) + path, v)
            continue
        m = re.match(r"^out\.(0|2)\.(weight|bias)$", k)
        if m:
            which, kind = m.groups()
            if which == "0":
                _set(tree, ("conv_norm_out", "scale" if kind == "weight" else "bias"),
                     value)
            else:
                _set(tree, ("conv_out", "kernel" if kind == "weight" else "bias"),
                     _conv(value) if kind == "weight" else value)
            continue
        raise KeyError(f"unhandled SGM UNet key: {key}")
    return {"params": tree}


# ---------------------------------------------------------------------------
# LDM VAE (first_stage_model)
# ---------------------------------------------------------------------------

def _ldm_resnet(rest: str, value: np.ndarray):
    ren = {"nin_shortcut": "conv_shortcut"}
    parts = rest.split(".")
    name = ren.get(parts[0], parts[0])
    kind = parts[1]
    if kind == "weight":
        if value.ndim == 4:
            return (name, "kernel"), _conv(value)
        return (name, "scale"), value
    return (name, "bias"), value


def _ldm_attn(rest: str, value: np.ndarray):
    ren = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out",
           "norm": "group_norm"}
    parts = rest.split(".")
    name = ren[parts[0]]
    kind = parts[1]
    if kind == "weight":
        if value.ndim == 4:   # 1x1 conv weights [C,C,1,1] -> dense [C,C]
            return (name, "kernel"), _linear(value[:, :, 0, 0])
        if value.ndim == 2:
            return (name, "kernel"), _linear(value)
        return (name, "scale"), value
    return (name, "bias"), value


def convert_ldm_vae(state: Dict[str, np.ndarray], n_levels: int,
                    layers_per_block: int) -> dict:
    tree: dict = {}
    for key, value in state.items():
        if not key.startswith("first_stage_model."):
            continue
        k = key[len("first_stage_model."):]
        if k.startswith("quant_conv.") or k.startswith("post_quant_conv."):
            path, v = _leaf(k, value)
            _set(tree, path, v)
            continue
        m = re.match(r"^(encoder|decoder)\.(.*)$", k)
        if not m:
            raise KeyError(f"unhandled LDM VAE key: {key}")
        side, rest = m.groups()

        mm = re.match(r"^conv_(in|out)\.(weight|bias)$", rest)
        if mm:
            which, kind = mm.groups()
            v = _conv(value) if kind == "weight" else value
            _set(tree, (side, f"conv_{which}", "kernel" if kind == "weight" else "bias"), v)
            continue
        mm = re.match(r"^norm_out\.(weight|bias)$", rest)
        if mm:
            kind = mm.group(1)
            _set(tree, (side, "conv_norm_out", "scale" if kind == "weight" else "bias"),
                 value)
            continue
        mm = re.match(r"^mid\.(block_1|attn_1|block_2)\.(.*)$", rest)
        if mm:
            which, leaf = mm.groups()
            if which == "attn_1":
                path, v = _ldm_attn(leaf, value)
                _set(tree, (side, "mid_block", "attentions_0") + path, v)
            else:
                name = "resnets_0" if which == "block_1" else "resnets_1"
                path, v = _ldm_resnet(leaf, value)
                _set(tree, (side, "mid_block", name) + path, v)
            continue
        mm = re.match(r"^down\.(\d+)\.(block|downsample)\.(.*)$", rest)
        if mm:
            lvl, what, leaf = int(mm.group(1)), mm.group(2), mm.group(3)
            if what == "downsample":
                assert leaf.startswith("conv.")
                kind = leaf[len("conv."):]
                v = _conv(value) if kind == "weight" else value
                _set(tree, (side, f"down_blocks_{lvl}_downsamplers_0_conv",
                            "kernel" if kind == "weight" else "bias"), v)
            else:
                j, leaf2 = leaf.split(".", 1)
                path, v = _ldm_resnet(leaf2, value)
                _set(tree, (side, f"down_blocks_{lvl}_resnets_{j}") + path, v)
            continue
        mm = re.match(r"^up\.(\d+)\.(block|upsample)\.(.*)$", rest)
        if mm:
            # LDM decoder.up is indexed in REVERSE (up.0 = lowest res last block)
            lvl = n_levels - 1 - int(mm.group(1))
            what, leaf = mm.group(2), mm.group(3)
            if what == "upsample":
                assert leaf.startswith("conv.")
                kind = leaf[len("conv."):]
                v = _conv(value) if kind == "weight" else value
                _set(tree, (side, f"up_blocks_{lvl}_upsamplers_0_conv",
                            "kernel" if kind == "weight" else "bias"), v)
            else:
                j, leaf2 = leaf.split(".", 1)
                path, v = _ldm_resnet(leaf2, value)
                _set(tree, (side, f"up_blocks_{lvl}_resnets_{j}") + path, v)
            continue
        raise KeyError(f"unhandled LDM VAE key: {key}")
    return {"params": tree}


# ---------------------------------------------------------------------------
# OpenCLIP text encoder (conditioner.embedders.1.model)
# ---------------------------------------------------------------------------

def convert_openclip_text(state: Dict[str, np.ndarray], prefix: str,
                          num_heads: int) -> dict:
    tree: dict = {}
    for key, value in state.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k == "token_embedding.weight":
            _set(tree, ("token_embedding", "embedding"), value)
            continue
        if k == "positional_embedding":
            _set(tree, ("position_embedding",), value)
            continue
        if k == "text_projection":
            # parameter used as x @ W: already [in, out] — no transpose
            _set(tree, ("text_projection", "kernel"), value)
            continue
        if k in ("ln_final.weight", "ln_final.bias"):
            kind = "scale" if k.endswith("weight") else "bias"
            _set(tree, ("final_layer_norm", kind), value)
            continue
        if k == "logit_scale":
            continue
        m = re.match(r"^transformer\.resblocks\.(\d+)\.(.*)$", k)
        if m:
            i, rest = m.group(1), m.group(2)
            layer = f"layers_{i}"
            if rest.startswith("attn.in_proj_"):
                kind = "kernel" if rest.endswith("weight") else "bias"
                q, kk, v = np.split(value, 3, axis=0)
                for name, t in (("q_proj", q), ("k_proj", kk), ("v_proj", v)):
                    t2 = _linear(t) if kind == "kernel" else t
                    _set(tree, (layer, "self_attn", name, kind), t2)
                continue
            ren = {"attn.out_proj": ("self_attn", "out_proj"),
                   "ln_1": ("layer_norm1",), "ln_2": ("layer_norm2",),
                   "mlp.c_fc": ("mlp", "fc1"), "mlp.c_proj": ("mlp", "fc2")}
            for sgm, ours in ren.items():
                if rest.startswith(sgm + "."):
                    kind = rest[len(sgm) + 1:]
                    if kind == "weight":
                        if value.ndim == 2:
                            _set(tree, (layer,) + ours + ("kernel",), _linear(value))
                        else:
                            _set(tree, (layer,) + ours + ("scale",), value)
                    else:
                        _set(tree, (layer,) + ours + ("bias",), value)
                    break
            else:
                raise KeyError(f"unhandled OpenCLIP key: {key}")
            continue
        raise KeyError(f"unhandled OpenCLIP key: {key}")
    return {"params": tree}


def convert_single_file(state: Dict[str, np.ndarray], config: ModelBundleConfig):
    """Full single-file SDXL checkpoint -> dict of flax param trees."""
    from cfgpp_tpu.weights.convert import convert_clip_text

    clip1 = {k[len("conditioner.embedders.0.transformer."):]: v
             for k, v in state.items()
             if k.startswith("conditioner.embedders.0.transformer.")}
    out = {
        "unet": convert_sgm_unet(state, config.unet),
        "vae": convert_ldm_vae(state, len(config.vae.block_out_channels),
                               config.vae.layers_per_block),
        "text": convert_clip_text(clip1),
    }
    if config.text_encoder_2 is not None:
        out["text2"] = convert_openclip_text(
            state, "conditioner.embedders.1.model.",
            config.text_encoder_2.num_heads)
    return out


def load_single_file_bundle(bundle, checkpoint_path: str):
    """Populate an SDXL(-Lightning) bundle from one safetensors file
    (the reference's `from_single_file` path, latent_sdxl.py:390)."""
    import jax
    from safetensors.numpy import load_file

    from cfgpp_tpu.weights.convert import validate_structure

    state = load_file(checkpoint_path)
    trees = convert_single_file(state, bundle.config)

    def cast_like(converted, reference):
        return jax.tree.map(lambda c, r: np.asarray(c).astype(r.dtype),
                            converted, reference)

    validate_structure(trees["unet"], bundle.unet_params, "unet(single-file)")
    bundle.unet_params = cast_like(trees["unet"], bundle.unet_params)
    validate_structure(trees["vae"], bundle.vae_params, "vae(single-file)")
    bundle.vae_params = cast_like(trees["vae"], bundle.vae_params)
    validate_structure(trees["text"], bundle.text_params, "text(single-file)")
    bundle.text_params = cast_like(trees["text"], bundle.text_params)
    if "text2" in trees:
        validate_structure(trees["text2"], bundle.text_params_2, "text2(single-file)")
        bundle.text_params_2 = cast_like(trees["text2"], bundle.text_params_2)
    return bundle
