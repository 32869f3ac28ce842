"""Flax wrappers that route VAE decoder blocks through the fused
GN-SiLU-conv3x3 Pallas kernel (kernels/fused_conv.py) while declaring the
EXACT parameter tree of the XLA modules they replace (``ResnetBlock2D``,
``Upsample2D`` in nn/layers.py) — checkpoints and torch weight ports
(weights/torch_port.py) are layout-identical across backends.

Used by ``nn/vae.py::Decoder`` when ``conv_backend="fused"`` — an OPTIONAL
backend, NOT the default: the pipelines default to ``"xla"`` because
end-to-end slope timing measured the fused decoder 2.3x slower in-pipeline
despite XLA's narrow-channel 512^2/256^2 conv stages sitting at 34-46% MXU
in isolation (PERF.md, "fused-conv experiment"). Kept for shapes/configs
where the tradeoff flips and as the parity-tested Pallas conv reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from genima_tpu.kernels.fused_conv import fold_group_norm, fused_conv3x3


class _GNParams(nn.Module):
    """Parameter twin of nn.GroupNorm: declares scale/bias, no compute."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return scale, bias


class _ConvParams(nn.Module):
    """Parameter twin of nn.Conv: declares kernel/bias, no compute."""

    in_channels: int
    out_channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_channels, self.out_channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return w, b


def _groups(channels: int) -> int:
    import math

    return 32 if channels % 32 == 0 else math.gcd(channels, 32)


class FusedResnetBlock2D(nn.Module):
    """ResnetBlock2D (no time emb, eps 1e-6 — the VAE variant) computed as
    two fused kernel calls; param tree identical to the XLA block."""

    out_channels: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        cout = self.out_channels
        g1 = _GNParams(cin, name="norm1")()
        w1, b1 = _ConvParams(cin, cout, name="conv1")()
        g2 = _GNParams(cout, name="norm2")()
        w2, b2 = _ConvParams(cout, cout, name="conv2")()

        x = x.astype(self.dtype)
        if cin != cout:
            ws, bs = _ConvParams(cin, cout, kernel=1, name="conv_shortcut")()
            # shortcut applies to the BLOCK input, not the kernel input, so
            # it rides the residual operand (XLA einsum fuses with the
            # previous write)
            shortcut = (
                jnp.einsum("bhwc,co->bhwo", x, ws[0, 0].astype(self.dtype))
                + bs.astype(self.dtype)[None, None, None]
            )
        else:
            shortcut = x

        s1, t1 = fold_group_norm(x, g1[0], g1[1], _groups(cin), self.eps)
        h = fused_conv3x3(
            x, w1.astype(self.dtype), b1.astype(self.dtype), s1, t1
        )
        s2, t2 = fold_group_norm(h, g2[0], g2[1], _groups(cout), self.eps)
        return fused_conv3x3(
            h, w2.astype(self.dtype), b2.astype(self.dtype), s2, t2,
            residual=shortcut.astype(self.dtype),
        )


def fused_gn_silu_conv(x, gn_params, conv_params, eps=1e-6):
    """gn -> silu -> conv3x3 from raw param tuples (used by Decoder for its
    top-level conv_norm_out/conv_out pair, whose params are direct children
    of the Decoder scope)."""
    gamma, beta = gn_params
    w, b = conv_params
    s, t = fold_group_norm(x, gamma, beta, _groups(x.shape[-1]), eps)
    return fused_conv3x3(x, w.astype(x.dtype), b.astype(x.dtype), s, t)
