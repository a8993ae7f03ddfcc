"""HF-layout converter round-trip tests (weights/convert.py).

Strategy (VERDICT round-1 gap: converter numerics were only key/shape
checked): take random tiny Flax params, EMIT a synthetic diffusers-layout
state dict from them with an independent inverse mapping written here, run
the production converters, and require bit-exact tree equality.  Any
transposition, scale/bias swap, or misrouted key in any layer type breaks
the round trip.

Layout inverses (flax -> torch): kernel [kh,kw,I,O] -> weight [O,I,kh,kw];
kernel [I,O] -> weight [O,I]; scale -> weight; raw embeddings -> weight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgpp_tpu.engine import ModelBundle

pytestmark = pytest.mark.slow  # >60s-class integration module: run via the full suite (pytest tests/ -q); the default dev selection is -m "not slow" (see pyproject)
from cfgpp_tpu.weights.convert import (convert_clip_text, convert_unet,
                                       convert_vae)


# --------------------------------------------------------------- emitters
def _leaf_to_torch(name: str, leaf: np.ndarray):
    """(flax leaf name, tensor) -> (torch suffix, tensor)."""
    leaf = np.asarray(leaf)
    if name == "kernel":
        if leaf.ndim == 4:
            return "weight", np.transpose(leaf, (3, 2, 0, 1))
        return "weight", np.transpose(leaf, (1, 0))
    if name == "scale":
        return "weight", leaf
    if name == "bias":
        return "bias", leaf
    if name == "embedding":
        return "weight", leaf
    raise AssertionError(f"unexpected leaf {name}")


def _module_to_torch(part: str) -> str:
    """Flattened flax module name -> dotted diffusers name."""
    import re
    # to_out -> to_out.0 (diffusers ModuleList wrapper)
    if part == "to_out":
        return "to_out.0"
    if part == "net_0_proj":
        return "net.0.proj"
    if part == "net_2":
        return "net.2"
    m = re.match(r"^(down_blocks|up_blocks)_(\d+)_"
                 r"(resnets|attentions|downsamplers|upsamplers)_(\d+)(_conv)?$",
                 part)
    if m:
        blk, i, sub, j, conv = m.groups()
        return f"{blk}.{i}.{sub}.{j}" + (".conv" if conv else "")
    m = re.match(r"^mid_block_(resnets|attentions)_(\d+)$", part)
    if m:
        return f"mid_block.{m.group(1)}.{m.group(2)}"
    m = re.match(r"^(transformer_blocks|layers|resnets|attentions)_(\d+)$", part)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    return part


def _emit(tree, prefix=""):
    """Flax param tree -> diffusers-style flat state dict."""
    state = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            state.update(_emit(v, prefix + _module_to_torch(k) + "."))
        elif k in ("kernel", "scale", "bias", "embedding"):
            suffix, t = _leaf_to_torch(k, v)
            state[prefix + suffix] = t
        else:
            # raw array param (e.g. position_embedding)
            state[prefix + _module_to_torch(k) + ".weight"] = np.asarray(v)
    return state


def _assert_trees_equal(got, want, path=""):
    assert set(got) == set(want), \
        f"{path}: keys {sorted(got)} != {sorted(want)}"
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, dict):
            _assert_trees_equal(g, w, f"{path}/{k}")
        else:
            g, w = np.asarray(g), np.asarray(w)
            assert g.shape == w.shape, f"{path}/{k}: {g.shape} vs {w.shape}"
            np.testing.assert_array_equal(g, w, err_msg=f"{path}/{k}")


@pytest.fixture(scope="module")
def tiny_sdxl_bundle():
    return ModelBundle.random_init("tiny_sdxl", dtype=jnp.float32,
                                   param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_sd_bundle():
    return ModelBundle.random_init("tiny_sd", dtype=jnp.float32,
                                   param_dtype=jnp.float32)


def _np_params(params):
    return jax.tree.map(lambda x: np.asarray(x), params)


def test_unet_roundtrip_sdxl(tiny_sdxl_bundle):
    """Linear-projection UNet (SDXL layout) round-trips bit-exact."""
    ref = _np_params(tiny_sdxl_bundle.unet_params)["params"]
    state = _emit(ref)
    out = convert_unet(state)["params"]
    _assert_trees_equal(out, ref)


def test_unet_roundtrip_sd15(tiny_sd_bundle):
    """Conv-projection UNet (SD-1.5 layout, proj_in/out as 1x1 convs)."""
    ref = _np_params(tiny_sd_bundle.unet_params)["params"]
    state = _emit(ref)
    out = convert_unet(state)["params"]
    _assert_trees_equal(out, ref)


def test_vae_roundtrip(tiny_sdxl_bundle):
    ref = _np_params(tiny_sdxl_bundle.vae_params)["params"]
    state = _emit(ref)
    out = convert_vae(state)["params"]
    _assert_trees_equal(out, ref)


def test_clip_text_roundtrip(tiny_sdxl_bundle):
    """Both CLIP text encoders (ViT-L-like and bigG-like with projection)."""
    for params in (tiny_sdxl_bundle.text_params, tiny_sdxl_bundle.text_params_2):
        ref = _np_params(params)["params"]
        state = {}
        for k, v in ref.items():
            if k == "token_embedding":
                state["text_model.embeddings.token_embedding.weight"] = \
                    np.asarray(v["embedding"])
            elif k == "position_embedding":
                state["text_model.embeddings.position_embedding.weight"] = \
                    np.asarray(v)
            elif k == "text_projection":
                state["text_projection.weight"] = \
                    np.transpose(np.asarray(v["kernel"]), (1, 0))
            elif k == "final_layer_norm":
                state["text_model.final_layer_norm.weight"] = np.asarray(v["scale"])
                state["text_model.final_layer_norm.bias"] = np.asarray(v["bias"])
            else:  # layers_N
                state.update(_emit({k: v}, "text_model.encoder."))
        out = convert_clip_text(state)["params"]
        _assert_trees_equal(out, ref)


def test_roundtrip_detects_transposition(tiny_sdxl_bundle):
    """Sanity: a deliberately transposed linear weight must NOT round-trip."""
    ref = _np_params(tiny_sdxl_bundle.unet_params)["params"]
    state = _emit(ref)
    key = next(k for k in state
               if k.endswith("net.0.proj.weight") and state[k].ndim == 2
               and state[k].shape[0] != state[k].shape[1])
    state[key] = np.ascontiguousarray(state[key].T)
    out = convert_unet(state)["params"]
    with pytest.raises(AssertionError):
        _assert_trees_equal(out, ref)
