"""Faithful torch reimplementations of the tiny diffusers architectures.

Used by test_full_model_parity.py as the golden reference for full-forward
weight-port parity (VERDICT round-1 missing #4). Written from the
architecture spec (diffusers 0.29 UNet2DConditionModel / ControlNetModel /
AutoencoderKL semantics, the models the reference loads in
``diffusion/train_controlnet_genima.py:1042-1071``); module attribute paths
match the diffusers state-dict names that
``genima_tpu.weights.torch_port.export_torch_state_dict`` emits, so
``load_state_dict(strict=True)`` doubles as a full-coverage check of the
port mapping.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def groups_for(c: int) -> int:
    return 32 if c % 32 == 0 else math.gcd(c, 32)


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = t.float()[:, None] * freqs[None]
    # flip_sin_to_cos=True (SD convention): [cos, sin]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, c_in: int, c_out: int, temb_dim: int | None,
                 eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups_for(c_in), c_in, eps=eps)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, c_out)
        self.norm2 = nn.GroupNorm(groups_for(c_out), c_out, eps=eps)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, dim: int, heads: int, cross_dim: int | None = None):
        super().__init__()
        self.heads = heads
        kv_dim = cross_dim if cross_dim is not None else dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(kv_dim, dim, bias=False)
        self.to_v = nn.Linear(kv_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        h = self.heads
        d = c // h
        q = self.to_q(x).reshape(b, s, h, d).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, -1, h, d).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, -1, h, d).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](out)


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward with GEGLU: net.0 = GEGLU proj, net.2 = Linear."""

    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        inner = dim * mult

        class _GEGLU(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, inner * 2)

            def forward(self, x):
                h, gate = self.proj(x).chunk(2, dim=-1)
                return h * F.gelu(gate)

        self.net = nn.ModuleList([_GEGLU(), nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, cross_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    """use_linear_projection=True variant (SD 2.x)."""

    def __init__(self, c: int, heads: int, cross_dim: int, layers: int = 1):
        super().__init__()
        self.norm = nn.GroupNorm(groups_for(c), c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(c, heads, cross_dim) for _ in range(layers)]
        )
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        residual = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        x = self.proj_in(x)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        x = self.proj_out(x)
        x = x.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return x + residual


class Downsample2D(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, cfg, c_in, c_out, level, temb_dim, last):
        super().__init__()
        self.has_attn = cfg.down_block_has_attn[level]
        self.resnets = nn.ModuleList()
        self.attentions = nn.ModuleList() if self.has_attn else None
        for i in range(cfg.layers_per_block):
            self.resnets.append(
                ResnetBlock2D(c_in if i == 0 else c_out, c_out, temb_dim)
            )
            if self.has_attn:
                self.attentions.append(
                    Transformer2DModel(
                        c_out, cfg.num_heads[level], cfg.cross_attention_dim,
                        cfg.transformer_layers_per_block[level],
                    )
                )
        if not last:
            self.downsamplers = nn.ModuleList([Downsample2D(c_out)])

    def forward(self, x, temb, ctx):
        outs = []
        for i, res in enumerate(self.resnets):
            x = res(x, temb)
            if self.has_attn:
                x = self.attentions[i](x, ctx)
            outs.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
            outs.append(x)
        return x, outs


class _MidBlock(nn.Module):
    def __init__(self, cfg, c, temb_dim):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(c, c, temb_dim), ResnetBlock2D(c, c, temb_dim)]
        )
        self.attentions = nn.ModuleList(
            [
                Transformer2DModel(
                    c, cfg.num_heads[-1], cfg.cross_attention_dim,
                    cfg.transformer_layers_per_block[-1],
                )
            ]
        )

    def forward(self, x, temb, ctx):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx)
        return self.resnets[1](x, temb)


class _UpBlock(nn.Module):
    def __init__(self, cfg, level, temb_dim, last):
        super().__init__()
        self.has_attn = cfg.down_block_has_attn[level]
        c_out = cfg.block_out_channels[level]
        self.resnets = nn.ModuleList()
        self.attentions = nn.ModuleList() if self.has_attn else None
        self.level = level
        if not last:
            self.upsamplers = nn.ModuleList([Upsample2D(c_out)])

    def add_resnet(self, c_in, c_out, cfg, temb_dim):
        self.resnets.append(ResnetBlock2D(c_in, c_out, temb_dim))
        if self.has_attn:
            self.attentions.append(
                Transformer2DModel(
                    c_out, cfg.num_heads[self.level], cfg.cross_attention_dim,
                    cfg.transformer_layers_per_block[self.level],
                )
            )

    def forward(self, x, skips, temb, ctx):
        for i, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if self.has_attn:
                x = self.attentions[i](x, ctx)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


def _build_down_and_mid(model, cfg, temb_dim):
    model.down_blocks = nn.ModuleList()
    c_prev = cfg.block_out_channels[0]
    for level, c_out in enumerate(cfg.block_out_channels):
        last = level == len(cfg.block_out_channels) - 1
        model.down_blocks.append(
            _DownBlock(cfg, c_prev, c_out, level, temb_dim, last)
        )
        c_prev = c_out
    model.mid_block = _MidBlock(cfg, cfg.block_out_channels[-1], temb_dim)


def _run_down(model, cfg, x, temb, ctx):
    residuals = [x]
    for block in model.down_blocks:
        x, outs = block(x, temb, ctx)
        residuals.extend(outs)
    return x, residuals


class TorchUNet2DCondition(nn.Module):
    """Tiny diffusers-architecture UNet (NCHW), state-dict compatible with
    export_torch_state_dict(flax_unet_params, 'diffusers_unet')."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        temb_dim = c0 * 4
        self.conv_in = nn.Conv2d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(c0, temb_dim)
        _build_down_and_mid(self, cfg, temb_dim)

        # up path: mirror of the down path, tracking skip channel counts
        skip_channels = [c0]
        for level, c_out in enumerate(cfg.block_out_channels):
            for _ in range(cfg.layers_per_block):
                skip_channels.append(c_out)
            if level != len(cfg.block_out_channels) - 1:
                skip_channels.append(c_out)
        self.up_blocks = nn.ModuleList()
        n = len(cfg.block_out_channels)
        x_ch = cfg.block_out_channels[-1]
        for i in range(n):
            level = n - 1 - i
            c_out = cfg.block_out_channels[level]
            up = _UpBlock(cfg, level, temb_dim, last=i == n - 1)
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_channels.pop()
                up.add_resnet(x_ch + skip, c_out, cfg, temb_dim)
                x_ch = c_out
            self.up_blocks.append(up)
        self.conv_norm_out = nn.GroupNorm(groups_for(c0), c0, eps=1e-5)
        self.conv_out = nn.Conv2d(c0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, t, ctx, down_residuals=None, mid_residual=None):
        temb = self.time_embedding(
            timestep_embedding(t, self.cfg.block_out_channels[0])
        )
        x = self.conv_in(sample)
        x, residuals = _run_down(self, self.cfg, x, temb, ctx)
        if down_residuals is not None:
            residuals = [r + c for r, c in zip(residuals, down_residuals)]
        x = self.mid_block(x, temb, ctx)
        if mid_residual is not None:
            x = x + mid_residual
        for up in self.up_blocks:
            x = up(x, residuals, temb, ctx)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchControlNetCondEmbedding(nn.Module):
    def __init__(self, out_ch: int, block_out=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, block_out[0], 3, padding=1)
        blocks = []
        for i in range(len(block_out) - 1):
            blocks.append(nn.Conv2d(block_out[i], block_out[i], 3, padding=1))
            blocks.append(
                nn.Conv2d(block_out[i], block_out[i + 1], 3, stride=2, padding=1)
            )
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(block_out[-1], out_ch, 3, padding=1)

    def forward(self, x):
        x = F.silu(self.conv_in(x))
        for b in self.blocks:
            x = F.silu(b(x))
        return self.conv_out(x)


class TorchControlNet(nn.Module):
    def __init__(self, cfg, cond_channels=(16, 32, 96, 256)):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        temb_dim = c0 * 4
        self.conv_in = nn.Conv2d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(c0, temb_dim)
        self.controlnet_cond_embedding = TorchControlNetCondEmbedding(
            c0, cond_channels
        )
        _build_down_and_mid(self, cfg, temb_dim)
        res_channels = [c0]
        for level, c_out in enumerate(cfg.block_out_channels):
            for _ in range(cfg.layers_per_block):
                res_channels.append(c_out)
            if level != len(cfg.block_out_channels) - 1:
                res_channels.append(c_out)
        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in res_channels]
        )
        c_last = cfg.block_out_channels[-1]
        self.controlnet_mid_block = nn.Conv2d(c_last, c_last, 1)

    def forward(self, sample, t, ctx, cond, conditioning_scale=1.0):
        temb = self.time_embedding(
            timestep_embedding(t, self.cfg.block_out_channels[0])
        )
        x = self.conv_in(sample) + self.controlnet_cond_embedding(cond)
        x, residuals = _run_down(self, self.cfg, x, temb, ctx)
        x = self.mid_block(x, temb, ctx)
        down = [
            proj(r) * conditioning_scale
            for proj, r in zip(self.controlnet_down_blocks, residuals)
        ]
        mid = self.controlnet_mid_block(x) * conditioning_scale
        return down, mid


class _VAEMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(c, c, None, eps=1e-6),
                ResnetBlock2D(c, c, None, eps=1e-6),
            ]
        )

        class VAEAttn(nn.Module):
            def __init__(self):
                super().__init__()
                self.group_norm = nn.GroupNorm(groups_for(c), c, eps=1e-6)
                self.to_q = nn.Linear(c, c)
                self.to_k = nn.Linear(c, c)
                self.to_v = nn.Linear(c, c)
                self.to_out = nn.ModuleList([nn.Linear(c, c)])

            def forward(self, x):
                b, ch, hh, ww = x.shape
                res = x
                y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, -1, ch)
                q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
                y = F.scaled_dot_product_attention(
                    q[:, None], k[:, None], v[:, None]
                )[:, 0]
                y = self.to_out[0](y)
                return res + y.reshape(b, hh, ww, ch).permute(0, 3, 1, 2)

        self.attentions = nn.ModuleList([VAEAttn()])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TorchVAE(nn.Module):
    """Tiny AutoencoderKL, state-dict compatible with the 'diffusers_vae'
    export family (flattened down/up block names)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chans = list(cfg.block_out_channels)

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
                self.down_blocks = nn.ModuleList()
                c_prev = chans[0]
                for level, c_out in enumerate(chans):
                    blk = nn.Module()
                    blk.resnets = nn.ModuleList()
                    for i in range(cfg.layers_per_block):
                        blk.resnets.append(
                            ResnetBlock2D(
                                c_prev if i == 0 else c_out, c_out, None,
                                eps=1e-6,
                            )
                        )
                    if level < len(chans) - 1:
                        blk.downsamplers = nn.ModuleList(
                            [nn.Module()]
                        )
                        blk.downsamplers[0].conv = nn.Conv2d(
                            c_out, c_out, 3, stride=2, padding=0
                        )
                    self.down_blocks.append(blk)
                    c_prev = c_out
                self.mid_block = _VAEMid(chans[-1])
                self.conv_norm_out = nn.GroupNorm(
                    groups_for(chans[-1]), chans[-1], eps=1e-6
                )
                self.conv_out = nn.Conv2d(
                    chans[-1], 2 * cfg.latent_channels, 3, padding=1
                )

            def forward(self, x):
                x = self.conv_in(x)
                for blk in self.down_blocks:
                    for res in blk.resnets:
                        x = res(x)
                    if hasattr(blk, "downsamplers"):
                        # diffusers asymmetric pad: (0,1) right/bottom
                        x = F.pad(x, (0, 1, 0, 1))
                        x = blk.downsamplers[0].conv(x)
                x = self.mid_block(x)
                return self.conv_out(F.silu(self.conv_norm_out(x)))

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                rev = list(reversed(chans))
                self.conv_in = nn.Conv2d(
                    cfg.latent_channels, rev[0], 3, padding=1
                )
                self.mid_block = _VAEMid(rev[0])
                self.up_blocks = nn.ModuleList()
                c_prev = rev[0]
                for level, c_out in enumerate(rev):
                    blk = nn.Module()
                    blk.resnets = nn.ModuleList()
                    for i in range(cfg.layers_per_block + 1):
                        blk.resnets.append(
                            ResnetBlock2D(
                                c_prev if i == 0 else c_out, c_out, None,
                                eps=1e-6,
                            )
                        )
                    if level < len(rev) - 1:
                        blk.upsamplers = nn.ModuleList([nn.Module()])
                        blk.upsamplers[0].conv = nn.Conv2d(
                            c_out, c_out, 3, padding=1
                        )
                    self.up_blocks.append(blk)
                    c_prev = c_out
                self.conv_norm_out = nn.GroupNorm(
                    groups_for(rev[-1]), rev[-1], eps=1e-6
                )
                self.conv_out = nn.Conv2d(rev[-1], cfg.out_channels, 3,
                                          padding=1)

            def forward(self, z):
                x = self.conv_in(z)
                x = self.mid_block(x)
                for blk in self.up_blocks:
                    for res in blk.resnets:
                        x = res(x)
                    if hasattr(blk, "upsamplers"):
                        x = F.interpolate(x, scale_factor=2, mode="nearest")
                        x = blk.upsamplers[0].conv(x)
                return self.conv_out(F.silu(self.conv_norm_out(x)))

        self.encoder = Encoder()
        self.decoder = Decoder()
        self.quant_conv = nn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1
        )
        self.post_quant_conv = nn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1
        )

    def encode_mode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, _ = moments.chunk(2, dim=1)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def load_exported(torch_model: nn.Module, exported: dict) -> None:
    """Load an export_torch_state_dict result into a torch module, strict."""
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()}
    torch_model.load_state_dict(sd, strict=True)
    torch_model.eval()


# ---------------------------------------------------------------------------
# taesd (published madebyollin/taesd layout: plain Sequentials)
# ---------------------------------------------------------------------------


class _TaesdClamp(nn.Module):
    def forward(self, x):
        return torch.tanh(x / 3.0) * 3.0


def _taesd_block(n_in, n_out):
    m = nn.Module()
    m.conv = nn.Sequential(
        nn.Conv2d(n_in, n_out, 3, padding=1), nn.ReLU(),
        nn.Conv2d(n_out, n_out, 3, padding=1), nn.ReLU(),
        nn.Conv2d(n_out, n_out, 3, padding=1),
    )
    m.skip = (
        nn.Conv2d(n_in, n_out, 1, bias=False) if n_in != n_out
        else nn.Identity()
    )
    m.forward = lambda x, m=m: F.relu(m.conv(x) + m.skip(x))
    return m


class _SeqWrap(nn.Module):
    """Sequential whose Module children keep their custom forward."""

    def __init__(self, layers):
        super().__init__()
        for i, layer in enumerate(layers):
            self.add_module(str(i), layer)
        self._n = len(layers)

    def forward(self, x):
        for i in range(self._n):
            x = getattr(self, str(i))(x)
        return x


def torch_taesd(latent_channels=4, width=64, n_levels=3, blocks=3):
    """Encoder/decoder pair in the upstream taesd Sequential layout."""
    enc = [nn.Conv2d(3, width, 3, padding=1), _taesd_block(width, width)]
    for _ in range(n_levels):
        enc.append(nn.Conv2d(width, width, 3, stride=2, padding=1, bias=False))
        enc.extend(_taesd_block(width, width) for _ in range(blocks))
    enc.append(nn.Conv2d(width, latent_channels, 3, padding=1))

    dec = [_TaesdClamp(), nn.Conv2d(latent_channels, width, 3, padding=1),
           nn.ReLU()]
    for _ in range(n_levels):
        dec.extend(_taesd_block(width, width) for _ in range(blocks))
        dec.append(nn.Upsample(scale_factor=2, mode="nearest"))
        dec.append(nn.Conv2d(width, width, 3, padding=1, bias=False))
    dec.append(_taesd_block(width, width))
    dec.append(nn.Conv2d(width, 3, 3, padding=1))
    return _SeqWrap(enc), _SeqWrap(dec)
