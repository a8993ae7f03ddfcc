"""Plain-torch reference UNet2DCondition + AutoencoderKL (test-only).

Independent NCHW implementations of the diffusers architectures the
reference delegates to (`/root/reference/latent_diffusion.py:67,117-129`,
`/root/reference/latent_sdxl.py:50`), written from the architecture
definitions with torch.nn primitives — NOT from the Flax code and NOT from
diffusers source.  Module attribute names follow the diffusers state-dict
layout so `cfgpp_tpu.weights.convert.convert_unet/convert_vae` can map a
random state dict onto the Flax modules; output parity between the two
then validates attention scaling, GroupNorm grouping order, GEGLU
split order, timestep-embedding sinusoid convention and the converter's
tensor transposes all at once (the holes synthetic round-trips cannot see).
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


def t_sinusoidal(t: torch.Tensor, dim: int, freq_shift: float = 0.0) -> torch.Tensor:
    """diffusers get_timestep_embedding with flip_sin_to_cos=True: [cos|sin]."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        / (half - freq_shift))
    ang = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


class TTimestepEmbedding(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, out_dim)
        self.linear_2 = nn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttention(nn.Module):
    """diffusers UNet attention: no bias on q/k/v, bias on to_out.0."""

    def __init__(self, query_dim, heads, head_dim, ctx_dim=None):
        super().__init__()
        inner = heads * head_dim
        ctx_dim = query_dim if ctx_dim is None else ctx_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, n, _ = x.shape
        m = ctx.shape[1]
        q = self.to_q(x).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(ctx).view(b, m, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(ctx).view(b, m, self.heads, self.head_dim).transpose(1, 2)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.head_dim), -1)
        out = (probs @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out[0](out)


class TFeedForward(nn.Module):
    """GEGLU: proj to 2x inner, first half value, second half gate."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        proj = nn.Module()
        proj.proj = nn.Linear(dim, inner * 2)
        self.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class TBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TAttention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TAttention(dim, heads, head_dim, ctx_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TTransformer2D(nn.Module):
    def __init__(self, ch, heads, head_dim, n_layers, ctx_dim, groups,
                 use_linear_projection):
        super().__init__()
        inner = heads * head_dim
        self.use_linear = use_linear_projection
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(ch, inner)
            self.proj_out = nn.Linear(inner, ch)
        else:
            self.proj_in = nn.Conv2d(ch, inner, 1)
            self.proj_out = nn.Conv2d(inner, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [TBasicTransformerBlock(inner, heads, head_dim, ctx_dim)
             for _ in range(n_layers)])

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        if self.use_linear:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        if self.use_linear:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, h, w, -1).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + residual


class TDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TUNet(nn.Module):
    """Mirror of diffusers UNet2DConditionModel built from a UNetConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        b0 = cfg.block_out_channels[0]
        temb_dim = cfg.time_embed_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, b0, 3, padding=1)
        self.time_embedding = TTimestepEmbedding(b0, temb_dim)
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = TTimestepEmbedding(
                cfg.projection_class_embeddings_input_dim, temb_dim)

        def make_resnet(i, o):
            return TResnetBlock(i, o, temb_dim, cfg.norm_num_groups, cfg.norm_eps)

        def make_attn(ch, level):
            heads = cfg.num_attention_heads[level]
            return TTransformer2D(ch, heads, ch // heads,
                                  cfg.transformer_layers_per_block[level],
                                  cfg.cross_attention_dim, cfg.norm_num_groups,
                                  cfg.use_linear_projection)

        n_blocks = len(cfg.block_out_channels)
        self.down_blocks = nn.ModuleList()
        ch = b0
        skip_chs = [b0]
        for i, (btype, out_ch) in enumerate(
                zip(cfg.down_block_types, cfg.block_out_channels)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            if btype == "CrossAttnDownBlock2D":
                blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(make_resnet(ch, out_ch))
                ch = out_ch
                if btype == "CrossAttnDownBlock2D":
                    blk.attentions.append(make_attn(out_ch, i))
                skip_chs.append(ch)
            if i < n_blocks - 1:
                blk.downsamplers = nn.ModuleList([TDownsample(out_ch)])
                skip_chs.append(ch)
            self.down_blocks.append(blk)

        mid_ch = cfg.block_out_channels[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [make_resnet(mid_ch, mid_ch), make_resnet(mid_ch, mid_ch)])
        self.mid_block.attentions = nn.ModuleList([make_attn(mid_ch, n_blocks - 1)])

        rev_channels = list(reversed(cfg.block_out_channels))
        self.up_blocks = nn.ModuleList()
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            level = n_blocks - 1 - i
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            if btype == "CrossAttnUpBlock2D":
                blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_chs.pop()
                blk.resnets.append(make_resnet(ch + skip, out_ch))
                ch = out_ch
                if btype == "CrossAttnUpBlock2D":
                    blk.attentions.append(make_attn(out_ch, level))
            if i < n_blocks - 1:
                blk.upsamplers = nn.ModuleList([TUpsample(out_ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, ch, eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states,
                added_text_embeds=None, added_time_ids=None):
        cfg = self.cfg
        b = sample.shape[0]
        t_emb = t_sinusoidal(torch.as_tensor(timesteps).expand(b),
                             cfg.block_out_channels[0], cfg.freq_shift)
        emb = self.time_embedding(t_emb)
        if cfg.addition_embed_type == "text_time":
            ids_emb = t_sinusoidal(added_time_ids.flatten(),
                                   cfg.addition_time_embed_dim, cfg.freq_shift)
            add_in = torch.cat([added_text_embeds, ids_emb.reshape(b, -1)], dim=-1)
            emb = emb + self.add_embedding(add_in)

        ctx = encoder_hidden_states
        x = self.conv_in(sample)
        res_stack = [x]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, r in enumerate(blk.resnets):
                x = r(x, emb)
                if attns:
                    x = attns[j](x, ctx)
                res_stack.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                res_stack.append(x)

        x = self.mid_block.resnets[0](x, emb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, emb)

        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, r in enumerate(blk.resnets):
                x = torch.cat([x, res_stack.pop()], dim=1)
                x = r(x, emb)
                if attns:
                    x = attns[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

class TVAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TVAEAttention(nn.Module):
    """Single-head attention over H*W tokens; q/k/v/out all biased."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        x = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        probs = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), -1)
        out = self.to_out[0](probs @ v)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


def _t_mid_block(ch, groups):
    m = nn.Module()
    m.resnets = nn.ModuleList([TVAEResnet(ch, ch, groups), TVAEResnet(ch, ch, groups)])
    m.attentions = nn.ModuleList([TVAEAttention(ch, groups)])
    return m


def _run_mid(m, x):
    return m.resnets[1](m.attentions[0](m.resnets[0](x)))


class TVAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, cfg.block_out_channels[0],
                                 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = cfg.block_out_channels[0]
        for i, out_ch in enumerate(cfg.block_out_channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(TVAEResnet(ch, out_ch, g))
                ch = out_ch
            if i < len(cfg.block_out_channels) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)
        self.mid_block = _t_mid_block(ch, g)
        self.conv_norm_out = nn.GroupNorm(g, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "downsamplers"):
                # diffusers VAE downsample: asymmetric (0,1) H/W pad, VALID conv
                x = blk.downsamplers[0].conv(F.pad(x, (0, 1, 0, 1)))
        x = _run_mid(self.mid_block, x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _t_mid_block(rev[0], g)
        self.up_blocks = nn.ModuleList()
        ch = rev[0]
        for i, out_ch in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(TVAEResnet(ch, out_ch, g))
                ch = out_ch
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(g, ch, eps=1e-6)
        self.conv_out = nn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = _run_mid(self.mid_block, self.conv_in(z))
        for blk in self.up_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0].conv(
                    F.interpolate(x, scale_factor=2.0, mode="nearest"))
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TAutoencoderKL(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TVAEEncoder(cfg)
        self.decoder = TVAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def encode_moments(self, x):
        mean, logvar = self.quant_conv(self.encoder(x)).chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
