"""SGM/LDM single-file converter tests.

Representative real-checkpoint key names (SDXL single-file layout) covering
every mapping branch: sequential block-index flattening, resnet in/out
layers, fused qkv splitting, the decoder.up reversal, and 1x1-conv->dense
attention weights.  (Numerical validation against a real Lightning
checkpoint happens once weights are available — none exist in this
environment.)
"""

import numpy as np
import pytest

from cfgpp_tpu.configs import sdxl_config, tiny_sdxl_config
from cfgpp_tpu.weights.single_file import (
    _unet_layout,
    convert_ldm_vae,
    convert_openclip_text,
    convert_sgm_unet,
)


def _get(tree, *path):
    node = tree["params"]
    for p in path:
        node = node[p]
    return node


def test_sgm_layout_sdxl():
    """SDXL: down types (Down, CrossAttn, CrossAttn), 2 layers/block.
    input_blocks: 1,2=res(l0); 3=down0; 4,5=res+attn(l1); 6=down1; 7,8=res+attn(l2)."""
    inputs, outputs = _unet_layout(sdxl_config().unet)
    assert inputs[1] == ("block", 0, 0, False)
    assert inputs[2] == ("block", 0, 1, False)
    assert inputs[3] == ("down", 0, 0, False)
    assert inputs[4] == ("block", 1, 0, True)
    assert inputs[6] == ("down", 1, 0, False)
    assert inputs[8] == ("block", 2, 1, True)
    # output_blocks: 3 per level; upsampler rides the LAST block of lvl 0,1
    assert outputs[0] == ("block", 0, 0, True, False)
    assert outputs[2] == ("block", 0, 2, True, True)
    assert outputs[5] == ("block", 1, 2, True, True)
    assert outputs[8] == ("block", 2, 2, False, False)


def test_sgm_unet_keys():
    cfg = sdxl_config().unet
    state = {
        "model.diffusion_model.time_embed.0.weight": np.zeros((1280, 320), np.float32),
        "model.diffusion_model.label_emb.0.0.weight": np.zeros((1280, 2816), np.float32),
        "model.diffusion_model.input_blocks.0.0.weight": np.zeros((320, 4, 3, 3), np.float32),
        "model.diffusion_model.input_blocks.1.0.in_layers.2.weight":
            np.zeros((320, 320, 3, 3), np.float32),
        "model.diffusion_model.input_blocks.1.0.emb_layers.1.weight":
            np.zeros((320, 1280), np.float32),
        "model.diffusion_model.input_blocks.3.0.op.weight":
            np.zeros((320, 320, 3, 3), np.float32),
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((640, 640), np.float32),
        "model.diffusion_model.input_blocks.4.0.skip_connection.weight":
            np.zeros((640, 320, 1, 1), np.float32),
        "model.diffusion_model.middle_block.1.norm.weight": np.zeros((1280,), np.float32),
        "model.diffusion_model.middle_block.2.out_layers.3.bias": np.zeros((1280,), np.float32),
        "model.diffusion_model.output_blocks.2.2.conv.weight":
            np.zeros((1280, 1280, 3, 3), np.float32),
        "model.diffusion_model.output_blocks.8.0.in_layers.0.weight":
            np.zeros((640,), np.float32),
        "model.diffusion_model.out.0.weight": np.zeros((320,), np.float32),
        "model.diffusion_model.out.2.weight": np.zeros((4, 320, 3, 3), np.float32),
    }
    t = convert_sgm_unet(state, cfg)
    assert _get(t, "time_embedding", "linear_1", "kernel").shape == (320, 1280)
    assert _get(t, "add_embedding", "linear_1", "kernel").shape == (2816, 1280)
    assert _get(t, "conv_in", "kernel").shape == (3, 3, 4, 320)
    assert _get(t, "down_blocks_0_resnets_0", "conv1", "kernel").shape == (3, 3, 320, 320)
    assert _get(t, "down_blocks_0_resnets_0", "time_emb_proj", "kernel").shape == (1280, 320)
    assert _get(t, "down_blocks_0_downsamplers_0", "conv", "kernel").shape == (3, 3, 320, 320)
    assert _get(t, "down_blocks_1_attentions_0", "transformer_blocks_0",
                "attn1", "to_q", "kernel").shape == (640, 640)
    assert _get(t, "down_blocks_1_resnets_0", "conv_shortcut", "kernel").shape == (1, 1, 320, 640)
    assert _get(t, "mid_block_attentions_0", "norm", "scale").shape == (1280,)
    assert _get(t, "mid_block_resnets_1", "conv2", "bias").shape == (1280,)
    assert _get(t, "up_blocks_0_upsamplers_0", "conv", "kernel").shape == (3, 3, 1280, 1280)
    assert _get(t, "up_blocks_2_resnets_2", "norm1", "scale").shape == (640,)
    assert _get(t, "conv_norm_out", "scale").shape == (320,)
    assert _get(t, "conv_out", "kernel").shape == (3, 3, 320, 4)


def test_sgm_unet_rejects_unknown_key():
    with pytest.raises(KeyError, match="unhandled SGM UNet key"):
        convert_sgm_unet({"model.diffusion_model.bogus.weight":
                          np.zeros((1,), np.float32)}, sdxl_config().unet)


def test_ldm_vae_keys():
    state = {
        "first_stage_model.encoder.conv_in.weight": np.zeros((128, 3, 3, 3), np.float32),
        "first_stage_model.encoder.down.0.block.0.norm1.weight": np.zeros((128,), np.float32),
        "first_stage_model.encoder.down.0.block.1.nin_shortcut.weight":
            np.zeros((128, 128, 1, 1), np.float32),
        "first_stage_model.encoder.down.1.downsample.conv.weight":
            np.zeros((256, 256, 3, 3), np.float32),
        "first_stage_model.encoder.mid.attn_1.q.weight": np.zeros((512, 512, 1, 1), np.float32),
        "first_stage_model.encoder.mid.attn_1.norm.weight": np.zeros((512,), np.float32),
        "first_stage_model.encoder.norm_out.weight": np.zeros((512,), np.float32),
        # decoder.up is REVERSED: up.0 -> our up_blocks_3 (4-level VAE)
        "first_stage_model.decoder.up.0.block.0.conv1.weight":
            np.zeros((128, 128, 3, 3), np.float32),
        "first_stage_model.decoder.up.3.upsample.conv.weight":
            np.zeros((512, 512, 3, 3), np.float32),
        "first_stage_model.quant_conv.weight": np.zeros((8, 8, 1, 1), np.float32),
    }
    t = convert_ldm_vae(state, n_levels=4, layers_per_block=2)
    assert _get(t, "encoder", "conv_in", "kernel").shape == (3, 3, 3, 128)
    assert _get(t, "encoder", "down_blocks_0_resnets_0", "norm1", "scale").shape == (128,)
    assert _get(t, "encoder", "down_blocks_0_resnets_1", "conv_shortcut",
                "kernel").shape == (1, 1, 128, 128)
    assert _get(t, "encoder", "down_blocks_1_downsamplers_0_conv", "kernel").shape == (3, 3, 256, 256)
    # 1x1 conv attention -> dense kernel [in, out]
    assert _get(t, "encoder", "mid_block", "attentions_0", "to_q", "kernel").shape == (512, 512)
    assert _get(t, "encoder", "mid_block", "attentions_0", "group_norm", "scale").shape == (512,)
    assert _get(t, "decoder", "up_blocks_3_resnets_0", "conv1", "kernel").shape == (3, 3, 128, 128)
    assert _get(t, "decoder", "up_blocks_0_upsamplers_0_conv", "kernel").shape == (3, 3, 512, 512)
    assert _get(t, "quant_conv", "kernel").shape == (1, 1, 8, 8)


@pytest.mark.slow  # ~2 min: full synthetic checkpoint + both converters
def test_full_single_file_roundtrip(tmp_path):
    """Synthesize a COMPLETE single-file checkpoint from a tiny SDXL bundle
    (inverse walk, tests/sgm_synth.py), write it as safetensors, and load it
    through the real `load_single_file_bundle` path: every parameter must
    round-trip bit-exactly and structural validation must pass."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from cfgpp_tpu.engine import ModelBundle
    from cfgpp_tpu.weights.single_file import load_single_file_bundle
    from sgm_synth import synth_single_file

    src = ModelBundle.random_init("tiny_sdxl", seed=3, dtype=jnp.float32,
                                  param_dtype=jnp.float32)
    state = synth_single_file(src)
    path = tmp_path / "lightning.safetensors"
    save_file(state, str(path))

    dst = ModelBundle.random_init("tiny_sdxl", seed=9, dtype=jnp.float32,
                                  param_dtype=jnp.float32)
    dst = load_single_file_bundle(dst, str(path))

    for name in ("unet_params", "vae_params", "text_params", "text_params_2"):
        a = jax.tree.leaves(getattr(src, name))
        b = jax.tree.leaves(getattr(dst, name))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_openclip_text_conversion():
    H = 8
    rng = np.random.RandomState(0)
    in_proj_w = rng.randn(3 * H, H).astype(np.float32)
    state = {
        "conditioner.embedders.1.model.token_embedding.weight":
            np.zeros((100, H), np.float32),
        "conditioner.embedders.1.model.positional_embedding":
            np.zeros((77, H), np.float32),
        "conditioner.embedders.1.model.text_projection":
            rng.randn(H, 6).astype(np.float32),
        "conditioner.embedders.1.model.ln_final.weight": np.zeros((H,), np.float32),
        "conditioner.embedders.1.model.logit_scale": np.zeros((), np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_weight":
            in_proj_w,
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.in_proj_bias":
            np.zeros((3 * H,), np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.attn.out_proj.weight":
            np.zeros((H, H), np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.ln_1.weight":
            np.zeros((H,), np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.mlp.c_fc.weight":
            np.zeros((4 * H, H), np.float32),
        "conditioner.embedders.1.model.transformer.resblocks.0.mlp.c_proj.bias":
            np.zeros((H,), np.float32),
    }
    t = convert_openclip_text(state, "conditioner.embedders.1.model.", num_heads=2)
    assert _get(t, "token_embedding", "embedding").shape == (100, H)
    assert _get(t, "position_embedding").shape == (77, H)
    # text_projection is a raw parameter (x @ W): NOT transposed
    assert _get(t, "text_projection", "kernel").shape == (H, 6)
    # fused qkv split in thirds along dim 0, then linear-transposed
    np.testing.assert_array_equal(_get(t, "layers_0", "self_attn", "q_proj", "kernel"),
                                  in_proj_w[:H].T)
    np.testing.assert_array_equal(_get(t, "layers_0", "self_attn", "v_proj", "kernel"),
                                  in_proj_w[2 * H:].T)
    assert _get(t, "layers_0", "mlp", "fc1", "kernel").shape == (H, 4 * H)
    assert _get(t, "final_layer_norm", "scale").shape == (H,)
