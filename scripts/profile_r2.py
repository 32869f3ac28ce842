"""Round-2 device-time breakdown of the SD-turbo ControlNet pipeline.

Round 1's standalone piece timings were polluted by ~3 ms of axon-relay
dispatch per call. Here each piece is chained K times inside ONE jitted
program via ``lax.scan`` (carry-chained so nothing can be hoisted or
deduped), so per-iteration device time = call_time / K with dispatch
amortized to ~0.

Run: PYTHONPATH=/root/repo python scripts/profile_r2.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from genima_tpu.nn.layers import ResnetBlock2D, Transformer2DModel, group_norm
from genima_tpu.nn.unet import UNetConfig, UNet2DConditionModel
from genima_tpu.nn.controlnet import ControlNetModel
from genima_tpu.nn.vae import AutoencoderKL, VAEConfig
from genima_tpu.diffusion.schedulers import EulerDiscreteScheduler

DT = jnp.bfloat16


def zeros_init(module, *args):
    """On-device zeros params (timing only; no h2d, no threefry compile)."""
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.key(0), *a), *args
    )["params"]
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )


def timeit(name, fn, *args, length, calls=5):
    # compile
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    compile_s = time.time() - t0
    times = []
    for i in range(calls):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        times.append(time.perf_counter() - t0)
    per_iter_ms = min(times) / length * 1000
    print(
        f"{name:42s} {per_iter_ms:8.3f} ms/iter  "
        f"(call min {min(times)*1000:7.1f} ms / {length}, compile {compile_s:.0f}s)",
        flush=True,
    )
    return per_iter_ms


def chain_module(module, params, x_shape, length, extra_args=lambda: ()):
    """scan a module K times, carry-chained."""
    extras = extra_args()

    @jax.jit
    def run(params, x):
        def body(c, _):
            y = module.apply({"params": params}, c, *extras)
            return y.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=length)
        return y

    x = jax.random.normal(jax.random.key(1), x_shape, DT)
    return run, (params, x)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = UNetConfig.sd21()
    temb_dim = cfg.block_out_channels[0] * 4  # 1280
    results = {}

    # -- per-level resnet blocks (out == in channels) ------------------------
    level_shapes = [
        ("L0 64x64x320", (1, 64, 64, 320)),
        ("L1 32x32x640", (1, 32, 32, 640)),
        ("L2 16x16x1280", (1, 16, 16, 1280)),
        ("L3  8x8x1280", (1, 8, 8, 1280)),
    ]
    temb = jax.random.normal(jax.random.key(2), (1, temb_dim), DT)
    for name, shape in level_shapes:
        m = ResnetBlock2D(out_channels=shape[-1], dtype=DT)
        p = zeros_init(m, jnp.zeros(shape, DT), temb)
        run, args = chain_module(m, p, shape, 100, extra_args=lambda: (temb,))
        results[f"resnet {name}"] = timeit(f"resnet {name}", run, *args, length=100)

    # -- per-level transformer blocks (self+cross+ff) ------------------------
    ctx = jax.random.normal(jax.random.key(3), (1, 77, 1024), DT)
    heads = {320: 5, 640: 10, 1280: 20}
    for name, shape in level_shapes:
        c = shape[-1]
        for backend in ("xla", "pallas"):
            if backend == "pallas" and shape[1] < 32:
                continue  # flash kernel targets the long-seq levels
            m = Transformer2DModel(
                in_channels=c, heads=heads[c], cross_attention_dim=1024,
                dtype=DT, backend=backend,
            )
            p = zeros_init(m, jnp.zeros(shape, DT), ctx)
            run, args = chain_module(
                m, p, shape, 50, extra_args=lambda: (ctx,)
            )
            results[f"tfmr {name} {backend}"] = timeit(
                f"tfmr {name} [{backend}]", run, *args, length=50
            )

    # -- groupnorm+silu and conv3x3 at L0 (kernel-sizing data) ---------------
    for name, shape in [level_shapes[0], level_shapes[2]]:
        c = shape[-1]

        class GNSiLU(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.silu(group_norm(c, 1e-5, DT, "norm")(x))

        m = GNSiLU()
        p = zeros_init(m, jnp.zeros(shape, DT))
        run, args = chain_module(m, p, shape, 200)
        results[f"gn+silu {name}"] = timeit(
            f"gn+silu {name}", run, *args, length=200
        )

        class Conv3(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(c, (3, 3), padding=1, dtype=DT, name="conv")(x)

        m = Conv3()
        p = zeros_init(m, jnp.zeros(shape, DT))
        run, args = chain_module(m, p, shape, 200)
        results[f"conv3x3 {name}"] = timeit(
            f"conv3x3 {name}", run, *args, length=200
        )

    # -- full UNet / ControlNet step ------------------------------------------
    lat_shape = (1, 64, 64, 4)
    t = jnp.full((1,), 500.0, jnp.float32)
    embeds = jax.random.normal(jax.random.key(4), (1, 77, 1024), DT)
    cond = jax.random.normal(jax.random.key(5), (1, 512, 512, 3), DT)

    unet = UNet2DConditionModel(cfg, dtype=DT)
    up = zeros_init(unet, jnp.zeros(lat_shape, DT), t, embeds)
    cn = ControlNetModel(cfg, conditioning_scale_channels=(16, 32, 96, 256), dtype=DT)
    cnp = zeros_init(cn, jnp.zeros(lat_shape, DT), t, embeds, cond)

    @jax.jit
    def unet_scan(up, x):
        def body(c, _):
            eps = unet.apply({"params": up}, c, t, embeds)
            return c + 0.1 * eps.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=20)
        return y

    x0 = jax.random.normal(jax.random.key(6), lat_shape, DT)
    results["unet step"] = timeit("unet full step", unet_scan, up, x0, length=20)

    @jax.jit
    def cn_scan(cnp, x):
        def body(c, _):
            down, mid = cn.apply({"params": cnp}, c, t, embeds, cond)
            return c + jnp.mean(mid).astype(c.dtype) * 0.01 + 0.001 * c, ()

        y, _ = jax.lax.scan(body, x, None, length=20)
        return y

    results["controlnet step"] = timeit(
        "controlnet full step", cn_scan, cnp, x0, length=20
    )

    @jax.jit
    def step_scan(up, cnp, x):
        def body(c, _):
            down, mid = cn.apply({"params": cnp}, c, t, embeds, cond)
            eps = unet.apply(
                {"params": up}, c, t, embeds,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            )
            return c + 0.1 * eps.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=10)
        return y

    results["cn+unet step"] = timeit(
        "cn+unet denoise step", step_scan, up, cnp, x0, length=10
    )

    # -- VAE decode -----------------------------------------------------------
    vae = AutoencoderKL(VAEConfig.sd(), dtype=DT)
    vparams = zeros_init(
        vae, jnp.zeros((1, 64, 64, 3), DT), jax.random.key(0)
    )
    # init signature is encode-shaped; decode only needs decoder params

    @jax.jit
    def vae_scan(vp, lat):
        def body(c, _):
            img = vae.apply({"params": vp}, c, method=vae.decode)
            return c + jnp.mean(img).astype(c.dtype) * 0.01, ()

        y, _ = jax.lax.scan(body, lat, None, length=5)
        return y

    lat = jax.random.normal(jax.random.key(7), (1, 64, 64, 4), DT)
    results["vae decode"] = timeit("vae decode 512", vae_scan, vparams, lat, length=5)

    print("\n== summary (ms) ==", flush=True)
    for k, v in results.items():
        print(f"{k:40s} {v:8.3f}")
    step = results.get("cn+unet step", 0)
    print(
        f"\n5-step device estimate: {5*step + results.get('vae decode', 0):.1f} ms "
        f"(bench p50 was 140.1 -> overhead = difference)",
        flush=True,
    )


if __name__ == "__main__":
    main()
