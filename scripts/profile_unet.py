"""Slope-based breakdown of the cn+unet denoise step (PERF round-2 cont.).

The step costs ~13 ms true device time vs ~5.6 ms MXU ideal. This measures
where the gap lives: op-class ablations (attention/GN identity) with the
relay floor cancelled, plus raw per-shape costs of the UNet's building
blocks (resblocks, transformer blocks, per level).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_unet.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")

from tputime import device_ms, zeros_init  # noqa: E402

import genima_tpu.nn.layers as L  # noqa: E402
from genima_tpu.nn.controlnet import ControlNetModel  # noqa: E402
from genima_tpu.nn.layers import ResnetBlock2D, Transformer2DModel  # noqa: E402
from genima_tpu.nn.unet import UNet2DConditionModel, UNetConfig  # noqa: E402

DT = jnp.bfloat16


def build_step(backend="fused"):
    cfg = UNetConfig.sd21()
    t = jnp.full((1,), 500.0, jnp.float32)
    embeds = jax.random.normal(jax.random.key(4), (1, 77, 1024), DT)
    cond = jax.random.normal(jax.random.key(5), (1, 512, 512, 3), DT)
    unet = UNet2DConditionModel(cfg, dtype=DT, backend=backend)
    cn = ControlNetModel(
        cfg, conditioning_scale_channels=(16, 32, 96, 256), dtype=DT,
        backend=backend,
    )
    lat = jnp.zeros((1, 64, 64, 4), DT)
    up = zeros_init(unet, lat, t, embeds)
    cnp = zeros_init(cn, lat, t, embeds, cond)

    def step(params, x):
        up, cnp = params
        down, mid = cn.apply({"params": cnp}, x, t, embeds, cond)
        eps = unet.apply(
            {"params": up}, x, t, embeds,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )
        return x + 0.1 * eps.astype(x.dtype)

    def unet_only(params, x):
        eps = unet.apply({"params": params}, x, t, embeds)
        return x + 0.1 * eps.astype(x.dtype)

    def cn_only(params, x):
        down, mid = cn.apply({"params": params}, x, t, embeds, cond)
        return x + 1e-6 * (jnp.mean(mid) + sum(jnp.mean(d) for d in down)).astype(x.dtype)

    x0 = jax.random.normal(jax.random.key(6), (1, 64, 64, 4), DT)
    return step, (up, cnp), unet_only, up, cn_only, cnp, x0


IDENT_GN = None


def main():
    print(f"devices: {jax.devices()}", flush=True)

    step, params, unet_only, up, cn_only, cnp, x0 = build_step("fused")

    # UNet FLOPs (rough, SD2.1 @64x64): ~0.72 TF; CN ~0.36 TF
    device_ms("cn+unet step [fused]", step, params, x0, l1=2, l2=10,
              flops=1.1e12)
    device_ms("unet only [fused]", unet_only, up, x0, l1=2, l2=10,
              flops=0.72e12)
    device_ms("controlnet only [fused]", cn_only, cnp, x0, l1=2, l2=10,
              flops=0.38e12)

    # identity-attention ablation (upper bound of ALL attention incl. proj)
    orig = dict(L._ATTN_BACKENDS)
    orig_dpa = jax.nn.dot_product_attention
    import genima_tpu.kernels.packed_attention as PA
    orig_packed = PA.packed_flash_attention
    L._ATTN_BACKENDS["xla"] = lambda q, k, v: q
    jax.nn.dot_product_attention = lambda q, k, v, **kw: q

    import genima_tpu.nn.layers as LL
    orig_fwd = None
    # knock out the packed kernel too (keep projections)
    LL.FUSED_MIN_SEQ = 10 ** 9  # route everything to xla (= identity above)
    step_i, params_i, unet_i, up_i, _, _, _ = build_step("fused")
    device_ms("cn+unet [attention scores = identity]", step_i, params_i, x0,
              l1=2, l2=10)
    L._ATTN_BACKENDS.update(orig)
    jax.nn.dot_product_attention = orig_dpa
    LL.FUSED_MIN_SEQ = 256

    # raw blocks per level: resblock + transformer at each resolution
    print("\nper-block shapes (UNet levels):", flush=True)
    emb = jnp.zeros((1, 1280), DT)
    ctx = jax.random.normal(jax.random.key(7), (1, 77, 1024), DT)
    for hw, ch, heads in [(64, 320, 5), (32, 640, 10), (16, 1280, 20),
                          (8, 1280, 20)]:
        x = jax.random.normal(jax.random.key(8), (1, hw, hw, ch), DT)
        rb = ResnetBlock2D(ch, dtype=DT)
        p = zeros_init(rb, x, emb)
        fl = 2 * hw * hw * 9 * ch * ch * 2 + 2 * ch * 1280 * 2
        device_ms(f"resblock @{hw}x{ch}",
                  lambda p, c, rb=rb: rb.apply({"params": p}, c, emb),
                  p, x, l1=2, l2=18, flops=fl)

        tr = Transformer2DModel(
            ch, heads, cross_attention_dim=1024, use_linear_projection=True,
            dtype=DT, backend="fused")
        p = zeros_init(tr, x, ctx)
        s = hw * hw
        fl = (
            4 * s * ch * ch * 2          # self qkv+out
            + 2 * 2 * s * s * ch * 2     # self attn matmuls
            + 2 * s * ch * ch * 2 + 2 * 77 * ch * ch * 2  # cross q + kv/out
            + 2 * 2 * s * 77 * ch * 2    # cross attn matmuls
            + 2 * s * ch * 8 * ch * 2    # geglu ff (mult 4, 2 mats)
            + 2 * s * ch * ch * 2        # proj in/out
        )
        device_ms(f"transformer @{hw}x{ch} h{heads}",
                  lambda p, c, tr=tr: tr.apply({"params": p}, c, ctx),
                  p, x, l1=2, l2=18, flops=fl)


if __name__ == "__main__":
    main()
