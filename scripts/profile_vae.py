"""Per-stage breakdown of the SD VAE decoder (the remaining ~18-24 ms of the
generation budget, PERF.md round-3 lever 1).

Uses slope-based device timing (scripts/tputime.py) — the per-call relay
round-trip cancels exactly, unlike the round-2 divide-by-length numbers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_vae.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, "/root/repo/scripts")

from tputime import device_ms, zeros_init  # noqa: E402

from genima_tpu.nn.layers import ResnetBlock2D, group_norm  # noqa: E402
from genima_tpu.nn.vae import AutoencoderKL, VAEConfig, VAEMidBlock  # noqa: E402

DT = jnp.bfloat16


class Stage(nn.Module):
    """One decoder level: n resnets (channel change on the first) and an
    optional nearest-2x upsample + conv, mirroring nn/vae.py Decoder."""

    out_ch: int
    n_resnets: int = 3
    upsample: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_resnets):
            x = ResnetBlock2D(self.out_ch, use_time_emb=False, eps=1e-6,
                              dtype=DT, name=f"r{i}")(x)
        if self.upsample:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=DT, name="up")(x)
        return x


def conv_flops(hw, cin, cout, k=3):
    return hw * hw * k * k * cin * cout * 2


def stage_flops(hw, cin, cout, n_resnets, upsample):
    f = conv_flops(hw, cin, cout) + conv_flops(hw, cout, cout)
    if cin != cout:
        f += hw * hw * cin * cout * 2
    for _ in range(n_resnets - 1):
        f += 2 * conv_flops(hw, cout, cout)
    if upsample:
        f += conv_flops(2 * hw, cout, cout)
    return f


def main():
    print(f"devices: {jax.devices()}", flush=True)
    total = 0.0

    # ---- whole decoder (ground truth) ----
    vae = AutoencoderKL(VAEConfig.sd(), dtype=DT)
    lat = jax.random.normal(jax.random.key(0), (1, 64, 64, 4), DT)
    vp = zeros_init(vae, jnp.zeros((1, 512, 512, 3), DT), jax.random.key(0))

    def dec(p, z):
        img = vae.apply({"params": p}, z, method=vae.decode)
        # fold the 512^2 image back into latent-shaped carry
        return z + jnp.mean(img).astype(z.dtype)[None, None, None, None] * 0

    # decode's output shape != input; wrap so scan carry works
    def dec_stage(p, z):
        img = vae.apply({"params": p}, z, method=vae.decode)
        return jnp.mean(img) + z

    ms = device_ms("FULL decode 64->512 (ground truth)", dec_stage, vp, lat,
                   l1=2, l2=8)
    print()

    # ---- stages ----
    mid = VAEMidBlock(512, dtype=DT)
    x64 = jax.random.normal(jax.random.key(0), (1, 64, 64, 512), DT)
    p = zeros_init(mid, x64)
    fl = 4 * conv_flops(64, 512, 512) + 2 * 4096 * 4096 * 512 * 2 \
        + 4 * 4096 * 512 * 512 * 2
    total += device_ms("mid block @64x512",
                       lambda p, x: mid.apply({"params": p}, x), p, x64,
                       flops=fl)

    specs = [
        ("up0 3xres512 @64 + up->128", 64, 512, 512, True),
        ("up1 3xres512 @128 + up->256", 128, 512, 512, True),
        ("up2 res(512->256)x3 @256 + up->512", 256, 512, 256, True),
        ("up3 res(256->128)x3 @512", 512, 256, 128, False),
    ]
    for name, hw, cin, cout, ups in specs:
        st = Stage(cout, 3, ups)
        x = jax.random.normal(jax.random.key(1), (1, hw, hw, cin), DT)
        p = zeros_init(st, x)
        fl = stage_flops(hw, cin, cout, 3, ups)
        total += device_ms(
            name, lambda p, x, st=st: st.apply({"params": p}, x), p, x,
            l1=2, l2=10, flops=fl)

    class Out(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = group_norm(x.shape[-1], 1e-6, DT, "gn")(x)
            x = nn.silu(x)
            return nn.Conv(3, (3, 3), padding=1, dtype=DT, name="out")(x)

    out = Out()
    x512 = jax.random.normal(jax.random.key(2), (1, 512, 512, 128), DT)
    p = zeros_init(out, x512)
    total += device_ms("gn+silu+conv_out @512",
                       lambda p, x: out.apply({"params": p}, x), p, x512,
                       l1=2, l2=10, flops=conv_flops(512, 128, 3))

    print(f"{'SUM of stages':44s} {total:8.3f} ms (vs full {ms:.3f})\n",
          flush=True)

    # ---- raw 3x3 conv shapes ----
    print("raw 3x3 convs (XLA conv_general_dilated):", flush=True)
    for hw, cin, cout in [(64, 512, 512), (128, 512, 512), (256, 512, 512),
                          (256, 512, 256), (256, 256, 256), (512, 256, 256),
                          (512, 128, 128), (512, 256, 128)]:
        w = jnp.zeros((3, 3, cin, cout), DT)
        x = jax.random.normal(jax.random.key(3), (1, hw, hw, cin), DT)

        def conv(w, c):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # keep carry shape: fold channel delta via slice when cin != cout
            if y.shape == c.shape:
                return y * 1e-3 + c
            return c + jnp.mean(y).astype(c.dtype) * 1e-6

        device_ms(f"conv {hw}x{hw} {cin}->{cout}", conv, w, x,
                  l1=2, l2=18, flops=conv_flops(hw, cin, cout))

    print("\nupsample variants @256x512ch -> conv 512:", flush=True)
    w = jnp.zeros((3, 3, 512, 512), DT)
    x = jax.random.normal(jax.random.key(4), (1, 256, 256, 512), DT)

    def resize_conv(w, c):
        b, h, wd, ch = c.shape
        y = jax.image.resize(c, (b, 2 * h, 2 * wd, ch), method="nearest")
        y = jax.lax.conv_general_dilated(
            y, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + jnp.mean(y).astype(c.dtype) * 1e-6

    def reshape_conv(w, c):
        b, h, wd, ch = c.shape
        y = jnp.broadcast_to(c[:, :, None, :, None, :], (b, h, 2, wd, 2, ch))
        y = y.reshape(b, 2 * h, 2 * wd, ch)
        y = jax.lax.conv_general_dilated(
            y, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + jnp.mean(y).astype(c.dtype) * 1e-6

    fl = conv_flops(512, 512, 512)
    device_ms("jax.image.resize + conv", resize_conv, w, x, l1=2, l2=10,
              flops=fl)
    device_ms("broadcast-reshape + conv", reshape_conv, w, x, l1=2, l2=10,
              flops=fl)


if __name__ == "__main__":
    main()
