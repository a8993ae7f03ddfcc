"""Test helper: synthesize a complete SGM/LDM single-file checkpoint from a
bundle's param trees (the inverse of cfgpp_tpu.weights.single_file).

Walking OUR trees and emitting the torch-layout keys lets tests drive the
whole single-file load path (key mapping, transposes, structural validation,
dtype casting) without any real checkpoint, and guarantees the converter
covers every parameter the models own.
"""

from __future__ import annotations

import re

import numpy as np

from cfgpp_tpu.weights.single_file import _unet_layout


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v, np.float32)
    return out


# NOTE: safetensors.save_file writes the underlying buffer of non-contiguous
# views verbatim (silently dropping the transpose) — always emit contiguous.

def _inv_linear(v):
    return np.ascontiguousarray(np.transpose(v, (1, 0)))


def _inv_conv(v):
    return np.ascontiguousarray(np.transpose(v, (3, 2, 0, 1)))


def _inv_leaf_name(path):
    """our intra-module path -> diffusers-style dotted suffix (shared by SGM
    transformer interiors)."""
    parts = []
    for p in path:
        m = re.match(r"^(transformer_blocks)_(\d+)$", p)
        if m:
            parts.append(f"{m.group(1)}.{m.group(2)}")
        elif p == "net_0_proj":
            parts.append("net.0.proj")
        elif p == "net_2":
            parts.append("net.2")
        elif p == "to_out":
            parts.append("to_out.0")
        else:
            parts.append(p)
    return ".".join(parts)


def _emit(out, key, kind, value):
    if kind == "kernel":
        if value.ndim == 4:
            out[key + ".weight"] = _inv_conv(value)
        else:
            out[key + ".weight"] = _inv_linear(value)
    elif kind == "scale":
        out[key + ".weight"] = value
    else:
        out[key + ".bias"] = value


_RESNET_INV = {"norm1": "in_layers.0", "conv1": "in_layers.2",
               "time_emb_proj": "emb_layers.1", "norm2": "out_layers.0",
               "conv2": "out_layers.3", "conv_shortcut": "skip_connection"}


def synth_sgm_unet(unet_params, cfg) -> dict:
    inputs, outputs = _unet_layout(cfg)
    inv_in = {}
    for sgm_idx, ent in inputs.items():
        what, lvl, j = ent[0], ent[1], ent[2]
        if what == "down":
            inv_in[f"down_blocks_{lvl}_downsamplers_0"] = (sgm_idx, "op")
        else:
            inv_in[f"down_blocks_{lvl}_resnets_{j}"] = (sgm_idx, "res")
            inv_in[f"down_blocks_{lvl}_attentions_{j}"] = (sgm_idx, "attn")
    inv_out = {}
    for sgm_idx, ent in outputs.items():
        _, lvl, j, has_attn, has_up = ent
        inv_out[f"up_blocks_{lvl}_resnets_{j}"] = (sgm_idx, "res")
        inv_out[f"up_blocks_{lvl}_attentions_{j}"] = (sgm_idx, "attn")
        if has_up:
            inv_out[f"up_blocks_{lvl}_upsamplers_0"] = (sgm_idx, "up", 2 if has_attn else 1)

    flat = _flatten(unet_params["params"])
    out = {}
    P = "model.diffusion_model."
    for path, v in flat.items():
        top, rest, kind = path[0], path[1:-1], path[-1]
        if top == "conv_in":
            _emit(out, P + "input_blocks.0.0", kind, v)
        elif top == "conv_out":
            _emit(out, P + "out.2", kind, v)
        elif top == "conv_norm_out":
            _emit(out, P + "out.0", kind, v)
        elif top == "time_embedding":
            n = "0" if rest[0] == "linear_1" else "2"
            _emit(out, P + f"time_embed.{n}", kind, v)
        elif top == "add_embedding":
            n = "0" if rest[0] == "linear_1" else "2"
            _emit(out, P + f"label_emb.0.{n}", kind, v)
        elif top.startswith("mid_block_"):
            which = {"mid_block_resnets_0": "0", "mid_block_attentions_0": "1",
                     "mid_block_resnets_1": "2"}[top]
            if which == "1":
                _emit(out, P + f"middle_block.1.{_inv_leaf_name(rest)}", kind, v)
            else:
                _emit(out, P + f"middle_block.{which}.{_RESNET_INV[rest[0]]}", kind, v)
        elif top in inv_in:
            ent = inv_in[top]
            if ent[1] == "op":
                # our subtree is ("conv", kernel/bias)
                _emit(out, P + f"input_blocks.{ent[0]}.0.op", kind, v)
            elif ent[1] == "res":
                _emit(out, P + f"input_blocks.{ent[0]}.0.{_RESNET_INV[rest[0]]}", kind, v)
            else:
                _emit(out, P + f"input_blocks.{ent[0]}.1.{_inv_leaf_name(rest)}", kind, v)
        elif top in inv_out:
            ent = inv_out[top]
            if ent[1] == "up":
                _emit(out, P + f"output_blocks.{ent[0]}.{ent[2]}.conv", kind, v)
            elif ent[1] == "res":
                _emit(out, P + f"output_blocks.{ent[0]}.0.{_RESNET_INV[rest[0]]}", kind, v)
            else:
                _emit(out, P + f"output_blocks.{ent[0]}.1.{_inv_leaf_name(rest)}", kind, v)
        else:
            raise KeyError(f"synth: unhandled unet path {path}")
    return out


_VAE_RES_INV = {"conv_shortcut": "nin_shortcut"}
_VAE_ATTN_INV = {"to_q": "q", "to_k": "k", "to_v": "v", "to_out": "proj_out",
                 "group_norm": "norm"}


def synth_ldm_vae(vae_params, n_levels: int) -> dict:
    flat = _flatten(vae_params["params"])
    out = {}
    P = "first_stage_model."
    for path, v in flat.items():
        top, kind = path[0], path[-1]
        if top in ("quant_conv", "post_quant_conv"):
            _emit(out, P + top, kind, v)
            continue
        side = top  # encoder/decoder
        sub, rest = path[1], path[2:-1]
        if sub == "conv_in" or sub == "conv_out":
            _emit(out, P + f"{side}.{sub}", kind, v)
        elif sub == "conv_norm_out":
            _emit(out, P + f"{side}.norm_out", kind, v)
        elif sub == "mid_block":
            which = rest[0]
            if which == "attentions_0":
                name = _VAE_ATTN_INV[rest[1]]
                if kind == "kernel" and v.ndim == 2 and name in ("q", "k", "v", "proj_out"):
                    out[P + f"{side}.mid.attn_1.{name}.weight"] = \
                        _inv_linear(v)[:, :, None, None]
                else:
                    _emit(out, P + f"{side}.mid.attn_1.{name}", kind, v)
            else:
                blk = "block_1" if which == "resnets_0" else "block_2"
                name = _VAE_RES_INV.get(rest[1], rest[1])
                _emit(out, P + f"{side}.mid.{blk}.{name}", kind, v)
        else:
            m = re.match(r"^(down|up)_blocks_(\d+)_(resnets)_(\d+)$", sub)
            if m:
                d, lvl, _, j = m.groups()
                lvl = int(lvl)
                if d == "up":
                    lvl = n_levels - 1 - lvl
                name = _VAE_RES_INV.get(rest[0], rest[0])
                _emit(out, P + f"{side}.{d}.{lvl}.block.{j}.{name}", kind, v)
                continue
            m = re.match(r"^(down|up)_blocks_(\d+)_(downsamplers|upsamplers)_0_conv$", sub)
            if m:
                d, lvl, s = m.groups()
                lvl = int(lvl)
                if d == "up":
                    lvl = n_levels - 1 - lvl
                word = "downsample" if s == "downsamplers" else "upsample"
                _emit(out, P + f"{side}.{d}.{lvl}.{word}.conv", kind, v)
                continue
            raise KeyError(f"synth: unhandled vae path {path}")
    return out


def synth_hf_clip(text_params) -> dict:
    flat = _flatten(text_params["params"])
    out = {}
    P = "conditioner.embedders.0.transformer."
    for path, v in flat.items():
        top, kind = path[0], path[-1]
        if top == "token_embedding":
            out[P + "text_model.embeddings.token_embedding.weight"] = v
        elif top == "position_embedding":
            out[P + "text_model.embeddings.position_embedding.weight"] = v
        elif top == "final_layer_norm":
            _emit(out, P + "text_model.final_layer_norm", kind, v)
        elif top.startswith("layers_"):
            i = top.split("_")[1]
            _emit(out, P + f"text_model.encoder.layers.{i}." +
                  ".".join(path[1:-1]), kind, v)
        else:
            raise KeyError(f"synth: unhandled clip path {path}")
    return out


def synth_openclip(text_params_2) -> dict:
    flat = _flatten(text_params_2["params"])
    out = {}
    P = "conditioner.embedders.1.model."
    # collect q/k/v per layer for fusing
    qkv = {}
    for path, v in flat.items():
        top, kind = path[0], path[-1]
        if top == "token_embedding":
            out[P + "token_embedding.weight"] = v
        elif top == "position_embedding":
            out[P + "positional_embedding"] = v
        elif top == "text_projection":
            out[P + "text_projection"] = v        # no transpose (x @ W param)
        elif top == "final_layer_norm":
            key = P + "ln_final." + ("weight" if kind == "scale" else "bias")
            out[key] = v
        elif top.startswith("layers_"):
            i = top.split("_")[1]
            inner = path[1]
            if inner == "self_attn":
                proj, kind = path[2], path[3]
                if proj in ("q_proj", "k_proj", "v_proj"):
                    qkv.setdefault((i, kind), {})[proj] = v
                else:  # out_proj
                    _emit(out, P + f"transformer.resblocks.{i}.attn.out_proj", kind, v)
            elif inner in ("layer_norm1", "layer_norm2"):
                n = "ln_1" if inner == "layer_norm1" else "ln_2"
                _emit(out, P + f"transformer.resblocks.{i}.{n}", kind, v)
            elif inner == "mlp":
                n = "c_fc" if path[2] == "fc1" else "c_proj"
                _emit(out, P + f"transformer.resblocks.{i}.mlp.{n}", path[3], v)
            else:
                raise KeyError(f"synth: unhandled openclip path {path}")
        else:
            raise KeyError(f"synth: unhandled openclip path {path}")
    for (i, kind), d in qkv.items():
        if kind == "kernel":
            fused = np.concatenate([_inv_linear(d["q_proj"]), _inv_linear(d["k_proj"]),
                                    _inv_linear(d["v_proj"])], axis=0)
            out[P + f"transformer.resblocks.{i}.attn.in_proj_weight"] = fused
        else:
            fused = np.concatenate([d["q_proj"], d["k_proj"], d["v_proj"]], axis=0)
            out[P + f"transformer.resblocks.{i}.attn.in_proj_bias"] = fused
    out[P + "logit_scale"] = np.zeros((), np.float32)
    return out


def synth_single_file(bundle) -> dict:
    state = {}
    state.update(synth_sgm_unet(bundle.unet_params, bundle.config.unet))
    state.update(synth_ldm_vae(bundle.vae_params,
                               len(bundle.config.vae.block_out_channels)))
    state.update(synth_hf_clip(bundle.text_params))
    if bundle.text_params_2 is not None:
        state.update(synth_openclip(bundle.text_params_2))
    return state
