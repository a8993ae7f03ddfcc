"""Weight-converter tests.

CLIP gets REAL numerical parity: transformers (installed, torch CPU) builds a
tiny CLIPTextModel, its state dict is converted, and our Flax encoder must
reproduce its hidden states / pooled output on the same token ids.  This
validates both the converter mapping and the CLIP module numerics end-to-end.

UNet/VAE converters (diffusers is NOT installed here) are checked on
representative real-checkpoint key names: correct flax path + transposition.
"""

import numpy as np
import pytest

from cfgpp_tpu.weights.convert import convert_clip_text, convert_unet, convert_vae


# ---------------------------------------------------------------------------
# CLIP: full numerical parity vs transformers
# ---------------------------------------------------------------------------

def _tiny_hf_clip(with_projection: bool):
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from transformers import CLIPTextModelWithProjection as HFProjModel

    cfg = HFConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=77, hidden_act="quick_gelu",
        projection_dim=48, eos_token_id=999, bos_token_id=998,
        pad_token_id=999, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = (HFProjModel if with_projection else HFModel)(cfg).eval()
    return cfg, model


@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_parity_vs_transformers(with_projection):
    import torch

    from cfgpp_tpu.configs import CLIPTextConfig
    from cfgpp_tpu.models import CLIPTextModel

    hf_cfg, hf_model = _tiny_hf_clip(with_projection)
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_clip_text(state)

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, hidden_act="quick_gelu",
        projection_dim=48 if with_projection else None, eos_token_id=999,
    )
    ours = CLIPTextModel(cfg)

    ids = np.zeros((2, 77), np.int64) + 999
    ids[0, :5] = [998, 11, 22, 33, 999]
    ids[1, :4] = [998, 44, 55, 999]

    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(ids), output_hidden_states=True)

    import jax.numpy as jnp
    out = ours.apply(params, jnp.asarray(ids, jnp.int32))

    if with_projection:
        hf_hidden = hf_out.hidden_states[-1]  # pre-final-LN states
        hf_pooled = hf_out.text_embeds
    else:
        hf_hidden = hf_out.hidden_states[-1]
        hf_pooled = hf_out.pooler_output

    np.testing.assert_allclose(np.asarray(out.last_hidden_state),
                               hf_out.last_hidden_state.numpy(), atol=2e-5)
    # penultimate tap used by SDXL (= hidden_states[-2])
    np.testing.assert_allclose(np.asarray(out.penultimate_hidden_state),
                               hf_out.hidden_states[-2].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.pooled_output),
                               hf_pooled.numpy(), atol=2e-5)

    # clip_skip tap: hidden_states[-(k+2)] (latent_sdxl.py:88-92)
    import jax.numpy as jnp2
    out_skip = ours.apply(params, jnp2.asarray(ids, jnp2.int32), 1)
    np.testing.assert_allclose(np.asarray(out_skip.penultimate_hidden_state),
                               hf_out.hidden_states[-3].numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# UNet / VAE converters: representative real key names
# ---------------------------------------------------------------------------

def _get(tree, *path):
    node = tree["params"]
    for p in path:
        node = node[p]
    return node


def test_unet_converter_paths_and_transposes():
    state = {
        "conv_in.weight": np.zeros((320, 4, 3, 3), np.float32),
        "conv_in.bias": np.zeros((320,), np.float32),
        "time_embedding.linear_1.weight": np.zeros((1280, 320), np.float32),
        "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((640, 768), np.float32),
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_out.0.weight":
            np.zeros((640, 640), np.float32),
        "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
            np.zeros((5120, 640), np.float32),
        "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.2.weight":
            np.zeros((640, 2560), np.float32),
        "down_blocks.0.resnets.0.norm1.weight": np.zeros((320,), np.float32),
        "down_blocks.0.resnets.0.time_emb_proj.weight": np.zeros((320, 1280), np.float32),
        "down_blocks.0.downsamplers.0.conv.weight": np.zeros((320, 320, 3, 3), np.float32),
        "mid_block.resnets.1.conv_shortcut.weight": np.zeros((1280, 1280, 1, 1), np.float32),
        "up_blocks.2.upsamplers.0.conv.weight": np.zeros((640, 640, 3, 3), np.float32),
        "conv_norm_out.weight": np.zeros((320,), np.float32),
        "add_embedding.linear_2.bias": np.zeros((1280,), np.float32),
    }
    t = convert_unet(state)
    assert _get(t, "conv_in", "kernel").shape == (3, 3, 4, 320)
    assert _get(t, "time_embedding", "linear_1", "kernel").shape == (320, 1280)
    assert _get(t, "down_blocks_1_attentions_0", "transformer_blocks_0",
                "attn2", "to_k", "kernel").shape == (768, 640)
    assert _get(t, "down_blocks_1_attentions_0", "transformer_blocks_0",
                "attn1", "to_out", "kernel").shape == (640, 640)
    assert _get(t, "down_blocks_1_attentions_0", "transformer_blocks_0",
                "ff", "net_0_proj", "kernel").shape == (640, 5120)
    assert _get(t, "down_blocks_1_attentions_0", "transformer_blocks_0",
                "ff", "net_2", "kernel").shape == (2560, 640)
    assert _get(t, "down_blocks_0_resnets_0", "norm1", "scale").shape == (320,)
    assert _get(t, "down_blocks_0_resnets_0", "time_emb_proj", "kernel").shape == (1280, 320)
    assert _get(t, "down_blocks_0_downsamplers_0", "conv", "kernel").shape == (3, 3, 320, 320)
    assert _get(t, "mid_block_resnets_1", "conv_shortcut", "kernel").shape == (1, 1, 1280, 1280)
    assert _get(t, "up_blocks_2_upsamplers_0", "conv", "kernel").shape == (3, 3, 640, 640)
    assert _get(t, "conv_norm_out", "scale").shape == (320,)
    assert _get(t, "add_embedding", "linear_2", "bias").shape == (1280,)


def test_vae_converter_paths():
    state = {
        "encoder.conv_in.weight": np.zeros((128, 3, 3, 3), np.float32),
        "encoder.down_blocks.0.resnets.0.norm1.weight": np.zeros((128,), np.float32),
        "encoder.down_blocks.0.downsamplers.0.conv.weight":
            np.zeros((128, 128, 3, 3), np.float32),
        "encoder.mid_block.attentions.0.to_q.weight": np.zeros((512, 512), np.float32),
        "encoder.mid_block.attentions.0.group_norm.weight": np.zeros((512,), np.float32),
        "decoder.up_blocks.1.upsamplers.0.conv.weight":
            np.zeros((512, 512, 3, 3), np.float32),
        "decoder.mid_block.resnets.0.conv1.weight": np.zeros((512, 512, 3, 3), np.float32),
        "quant_conv.weight": np.zeros((8, 8, 1, 1), np.float32),
        "post_quant_conv.bias": np.zeros((4,), np.float32),
    }
    t = convert_vae(state)
    assert _get(t, "encoder", "conv_in", "kernel").shape == (3, 3, 3, 128)
    assert _get(t, "encoder", "down_blocks_0_resnets_0", "norm1", "scale").shape == (128,)
    assert _get(t, "encoder", "down_blocks_0_downsamplers_0_conv", "kernel").shape == (3, 3, 128, 128)
    assert _get(t, "encoder", "mid_block", "attentions_0", "to_q", "kernel").shape == (512, 512)
    assert _get(t, "encoder", "mid_block", "attentions_0", "group_norm", "scale").shape == (512,)
    assert _get(t, "decoder", "up_blocks_1_upsamplers_0_conv", "kernel").shape == (3, 3, 512, 512)
    assert _get(t, "decoder", "mid_block", "resnets_0", "conv1", "kernel").shape == (3, 3, 512, 512)
    assert _get(t, "quant_conv", "kernel").shape == (1, 1, 8, 8)
    assert _get(t, "post_quant_conv", "bias").shape == (4,)


def test_vae_converter_legacy_attention_names():
    state = {
        "encoder.mid_block.attentions.0.query.weight": np.zeros((512, 512), np.float32),
        "encoder.mid_block.attentions.0.proj_attn.bias": np.zeros((512,), np.float32),
    }
    t = convert_vae(state)
    assert _get(t, "encoder", "mid_block", "attentions_0", "to_q", "kernel").shape == (512, 512)
    assert _get(t, "encoder", "mid_block", "attentions_0", "to_out", "bias").shape == (512,)


def test_structure_validation_catches_mismatch():
    from cfgpp_tpu.weights.convert import validate_structure
    good = {"params": {"a": {"kernel": np.zeros((2, 3))}}}
    with pytest.raises(ValueError, match="missing"):
        validate_structure({"params": {}}, good, "test")
    with pytest.raises(ValueError, match="shape"):
        validate_structure({"params": {"a": {"kernel": np.zeros((3, 2))}}}, good, "test")
