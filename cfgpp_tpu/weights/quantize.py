"""Offline int8 weight quantization for the opt-in W8A8 UNet fast path.

Walks a bf16 UNet param tree and converts every transformer projection
kernel (attention q/k/v/out, GEGLU feed-forward, linear proj_in/proj_out)
to symmetric per-output-channel int8 plus an f32 scale vector — the param
layout `cfgpp_tpu.models.quant.QuantDense` consumes.  Convolutions, norms
and the (tiny, quality-sensitive) time/added-condition embeddings stay in
bf16.

See models/quant.py for the runtime side and the measured v5e numbers.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp

from cfgpp_tpu.models.quant import quantize_kernel_int8

# Dense layers inside the UNet that the quant=True module tree replaces
# with QuantDense.  Names mirror diffusers' state-dict keys (convert.py).
QUANT_LAYER_NAMES = frozenset({
    "to_q", "to_k", "to_v", "to_out",       # attention projections
    "net_0_proj", "net_2",                  # GEGLU feed-forward
    "proj_in", "proj_out",                  # transformer linear projections
})
# Convolutions replaced with QuantConv: resnet convs + shortcut and the
# upsampler convs ("conv" only occurs under *samplers_0 in this tree).
# conv_in / conv_out (first and last layer) deliberately stay bf16, and so
# do the strided DOWNsampler convs: stride 2 can never route to the fused
# Pallas kernel, so quantizing them would only add rounding drift.
QUANT_CONV_NAMES = frozenset({"conv1", "conv2", "conv_shortcut", "conv"})


def quantize_unet_params(params: Any, mode: str = "all") -> Any:
    """bf16 UNet params -> mixed tree with int8 QuantDense/QuantConv leaves.

    ``mode="all"`` quantizes transformer projections and resnet convs;
    ``mode="dense"`` quantizes only the projections (convs stay bf16 —
    XLA's int8-conv lowering measured slower than bf16 in-context, while
    the Pallas int8 dense path wins).  ``proj_in``/``proj_out`` quantize in
    both layouts: 2-D Dense kernels (use_linear_projection=True, SDXL) and
    the SD-1.5 1x1-conv variant (4-D kernels — they ARE matmuls and route
    through int8_matmul via QuantConv).
    """
    from cfgpp_tpu.models.quant import quantize_conv_kernel_int8

    conv_names = QUANT_CONV_NAMES if mode == "all" else frozenset()

    def pack_qkv(attn):
        """Merge self-attention to_q/to_k/to_v into one packed to_qkv.

        The Attention module (quant mode, context=None) runs ONE int8
        matmul over the concatenated kernels — a single activation
        quantize pass instead of three, and the flash kernel reads the
        packed output via channel-offset views.  Per-output-channel
        quantization commutes with the concat, so quantize-then-concat
        equals concat-then-quantize."""
        kernel = jnp.concatenate(
            [jnp.asarray(attn[k]["kernel"], jnp.float32)
             for k in ("to_q", "to_k", "to_v")], axis=1)
        kq, scale = quantize_kernel_int8(kernel)
        new = {"to_qkv": {"kernel": jnp.asarray(kq), "scale": jnp.asarray(scale)}}
        new.update({k: walk(v, k, "attn1") for k, v in attn.items()
                    if k not in ("to_q", "to_k", "to_v")})
        return new

    def walk(tree, name, parent=""):
        if isinstance(tree, Mapping):
            if (name == "attn1"
                    and all(k in tree for k in ("to_q", "to_k", "to_v"))
                    and getattr(tree["to_q"].get("kernel"), "ndim", 0) == 2):
                return pack_qkv(tree)
            kernel = tree.get("kernel")
            ndim = getattr(kernel, "ndim", 0)
            is_conv = (name in conv_names and ndim == 4
                       and not (name == "conv" and "downsamplers" in parent))
            # SD15 conv-layout transformer projections: 1x1 convs, still
            # "dense" coverage (they run on the int8_matmul path)
            is_proj1x1 = name in ("proj_in", "proj_out") and ndim == 4
            if kernel is not None and (
                    (name in QUANT_LAYER_NAMES and ndim == 2) or is_conv
                    or is_proj1x1):
                quant = (quantize_kernel_int8 if ndim == 2
                         else quantize_conv_kernel_int8)
                kq, scale = quant(kernel)
                new = {"kernel": jnp.asarray(kq), "scale": jnp.asarray(scale)}
                if "bias" in tree:
                    new["bias"] = jnp.asarray(tree["bias"], jnp.float32)
                return new
            return {k: walk(v, k, name) for k, v in tree.items()}
        return tree

    return walk(params, "")
