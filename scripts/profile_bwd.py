"""Isolate the training backward cost: cn-only and unet-only
value_and_grad, slope-timed, to find where the ~60 ms backward goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_bwd.py <piece>
piece: cn | cnfwd | unet | unetfwd | cnnocond | condemb
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms  # noqa: E402


def zeros_like_tree(shapes):
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline

    piece = sys.argv[1] if len(sys.argv) > 1 else "cn"
    print(f"devices: {jax.devices()}  piece={piece}", flush=True)
    pipe = SDControlNetPipeline()
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    params = zeros_like_tree(shapes)
    cn = params["controlnet"]
    unet = params["unet"]

    lat = jax.random.normal(jax.random.key(2), (1, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.key(3), (1, 77, 1024), jnp.bfloat16)
    condb = jax.random.uniform(jax.random.key(1), (1, 512, 512, 3),
                               jnp.bfloat16)

    if piece in ("cn", "cnfwd", "cnnocond"):
        def cn_loss(p, x, cond):
            if piece == "cnnocond":
                cond = jax.lax.stop_gradient(cond) * 0.0
            down, mid = pipe.controlnet.apply({"params": p}, x, t, ctx, cond)
            return (
                jnp.mean(mid.astype(jnp.float32) ** 2)
                + sum(jnp.mean(d.astype(jnp.float32) ** 2) for d in down)
            )

        if piece == "cnfwd":
            def stage(p, x):
                return x + cn_loss(p, x, condb).astype(x.dtype) * 1e-6
            device_ms("cn fwd only", stage, cn, lat, l1=2, l2=8)
        else:
            def stage(p, x):
                l, g = jax.value_and_grad(cn_loss)(p, x, condb)
                lv = jax.tree_util.tree_leaves(g)
                return x + (l + jnp.mean(lv[0])).astype(x.dtype) * 1e-6
            device_ms(f"cn value_and_grad [{piece}]", stage, cn, lat,
                      l1=2, l2=6)

    if piece in ("unet", "unetfwd"):
        # grads wrt the residual INPUTS (what the CN training path needs
        # from the frozen UNet), not wrt unet params
        down_sh, mid_sh = jax.eval_shape(
            lambda p, x: pipe.controlnet.apply({"params": p}, x, t, ctx, condb),
            cn, lat,
        )
        downs = [jnp.zeros(s.shape, s.dtype) for s in down_sh]
        mid = jnp.zeros(mid_sh.shape, mid_sh.dtype)

        def unet_loss(residuals, p, x):
            downs_, mid_ = residuals
            eps = pipe.unet.apply(
                {"params": p}, x, t, ctx,
                down_block_additional_residuals=downs_,
                mid_block_additional_residual=mid_,
            )
            return jnp.mean(eps.astype(jnp.float32) ** 2)

        if piece == "unetfwd":
            def stage(p, x):
                return x + unet_loss((downs, mid), p, x).astype(x.dtype) * 1e-6
            device_ms("unet fwd only", stage, unet, lat, l1=2, l2=8)
        else:
            def stage(p, x):
                l, g = jax.value_and_grad(unet_loss)((downs, mid), p, x)
                lv = jax.tree_util.tree_leaves(g)
                return x + (l + jnp.mean(lv[0])).astype(x.dtype) * 1e-6
            device_ms("unet residual-grad", stage, unet, lat, l1=2, l2=6)

    if piece == "condemb":
        # just the ControlNet conditioning embedding (512^2 conv stack)
        from flax import linen as nn

        class CondEmb(nn.Module):
            @nn.compact
            def __call__(self, c):
                chans = (16, 32, 96, 256)
                x = nn.Conv(chans[0], (3, 3), padding=1, dtype=jnp.bfloat16)(c)
                x = nn.silu(x)
                for ch in chans[1:]:
                    x = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16)(x)
                    x = nn.silu(x)
                    x = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                dtype=jnp.bfloat16)(x)
                    x = nn.silu(x)
                return nn.Conv(320, (3, 3), padding=1, dtype=jnp.bfloat16)(x)

        m = CondEmb()
        p = zeros_like_tree(
            jax.eval_shape(lambda: m.init(jax.random.key(0), condb))
        )["params"]

        def ce_loss(p, c):
            return jnp.mean(m.apply({"params": p}, c).astype(jnp.float32) ** 2)

        def stage_f(p, x):
            return x + ce_loss(p, x).astype(x.dtype) * 1e-6

        device_ms("condemb fwd", stage_f, p, condb, l1=2, l2=8)

        def stage_g(p, x):
            l, g = jax.value_and_grad(ce_loss)(p, x)
            lv = jax.tree_util.tree_leaves(g)
            return x + (l + jnp.mean(lv[0])).astype(x.dtype) * 1e-6

        device_ms("condemb value_and_grad", stage_g, p, condb, l1=2, l2=6)


def fullchain():
    """True device time of the full train step: lax.scan over K steps inside
    one jit (no per-call dispatch/donation through the relay)."""
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig

    print(f"devices: {jax.devices()}  piece=fullchain", flush=True)
    pipe = SDControlNetPipeline()
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    params = zeros_like_tree(shapes)
    # 8-bit moments: the scan carry + jit input hold TWO state copies; f32
    # adamw state (2.7 GiB) x2 + frozen weights OOMs the 16 GB chip
    trainer = ControlNetTrainer(
        pipe, TrainConfig(learning_rate=1e-5, use_8bit_adam=True)
    )
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    state = trainer.create_state(params)
    batch = {
        "pixel_values": jnp.zeros((1, 512, 512, 3), jnp.float32),
        "conditioning_pixel_values": jnp.zeros((1, 512, 512, 3), jnp.float32),
        "input_ids": jnp.zeros((1, 77), jnp.int32),
    }

    def stage(p, x):
        st, fz = p

        def body(c, _):
            st_c, key = c
            key, sub = jax.random.split(key)
            b = dict(batch)
            b["pixel_values"] = batch["pixel_values"] + x.mean() * 1e-9
            new_st, m = trainer._step_impl(st_c, fz, b, sub)
            return (new_st, key), m["loss"]

        (st_f, _), losses = jax.lax.scan(
            body, (st, jax.random.key(0)), None, length=LENGTH
        )
        return x + jnp.mean(losses).astype(x.dtype) * 1e-6

    global LENGTH
    import time as _t
    results = {}
    for LENGTH in (2, 6):
        f = jax.jit(stage)
        t0 = _t.time()
        import numpy as _np
        _ = float(_np.asarray(f((state, frozen), batch["pixel_values"])))
        compile_s = _t.time() - t0
        times = []
        for _i in range(5):
            t0 = _t.perf_counter()
            _ = float(_np.asarray(f((state, frozen), batch["pixel_values"])))
            times.append(_t.perf_counter() - t0)
        results[LENGTH] = min(times)
        print(f"  len={LENGTH}: {min(times)*1000:.1f} ms/call "
              f"(compile {compile_s:.0f}s)", flush=True)
    ms = (results[6] - results[2]) / 4 * 1000
    print(f"train step true device time: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fullchain":
        fullchain()
    else:
        main()

