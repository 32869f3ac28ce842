"""Slope-timed breakdown of the 512^2 ControlNet training step: where do
the ~85 ms (bs=1, device time) go?

Pieces: VAE encode, text encode, cn+unet forward, cn+unet value_and_grad,
optimizer update, full step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_train.py
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
    from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    def want(name):
        return only is None or any(o in name for o in only)

    print(f"devices: {jax.devices()}  bs={bs} only={only}", flush=True)
    pipe = SDControlNetPipeline()
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    params = zeros_like_tree(shapes)
    trainer = ControlNetTrainer(pipe, TrainConfig(learning_rate=1e-5))
    frozen = {k: v for k, v in params.items() if k != "controlnet"}
    cn = params["controlnet"]

    img = jax.random.uniform(jax.random.key(0), (bs, 512, 512, 3))
    cond = jax.random.uniform(jax.random.key(1), (bs, 512, 512, 3))
    ids = jnp.zeros((bs, 77), jnp.int32)
    lat = jax.random.normal(jax.random.key(2), (bs, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((bs,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.key(3), (bs, 77, 1024), jnp.bfloat16)
    condb = cond.astype(jnp.bfloat16)

    # VAE encode
    def enc(p, x):
        d = pipe.vae.apply({"params": p}, x.astype(pipe.dtype),
                           method=pipe.vae.encode)
        return x + jnp.mean(d.mean).astype(x.dtype) * 1e-6

    if want("vae"):
        device_ms("vae encode 512^2", enc, frozen["vae"], img, l1=2, l2=8)

    # text encoder
    def txt(p, x):
        out = pipe.text_encoder.apply({"params": p}, ids)
        return x + jnp.mean(out.last_hidden_state).astype(x.dtype) * 1e-6

    if want("clip"):
        device_ms("clip text encode", txt, frozen["text_encoder"], img, l1=2, l2=12)

    # cn+unet forward only (frozen unet passed via params, NOT captured —
    # closure capture turns 3.5 GB of weights into baked constants)
    def fwd(p, x):
        cnp, unetp = p
        down, mid = pipe.controlnet.apply(
            {"params": cnp}, x, t, ctx, condb)
        eps = pipe.unet.apply(
            {"params": unetp}, x, t, ctx,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid)
        return x + eps * 1e-6

    if want("fwd"):
        device_ms("cn+unet fwd", fwd, (cn, frozen["unet"]), lat, l1=2, l2=8)

    # value_and_grad of the cn+unet region
    def vg(p, x):
        cnp, unetp = p

        def loss(cnp):
            down, mid = pipe.controlnet.apply(
                {"params": cnp}, x, t, ctx, condb)
            eps = pipe.unet.apply(
                {"params": unetp}, x, t, ctx,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid)
            return jnp.mean(eps.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(cnp)
        leaves = jax.tree_util.tree_leaves(g)
        return x + (l + sum(jnp.mean(a) for a in leaves[:3])).astype(x.dtype) * 1e-6

    if want("grad"):
        device_ms("cn+unet value_and_grad", vg, (cn, frozen["unet"]), lat,
                  l1=2, l2=6)

    # optimizer update alone
    state = trainer.create_state(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def opt(p, x):
        g, s, prm = p
        upd, new_os = trainer.tx.update(g, s, prm)
        leaves = jax.tree_util.tree_leaves(upd)
        return x + jnp.mean(leaves[0]).astype(x.dtype) * 1e-6

    if want("opt"):
        device_ms("optimizer update", opt,
                  (grads, state.opt_state, state.params), img, l1=2, l2=10)

    # full train step (loss fn incl. noise/aug path)
    def full(p, x):
        cnp, fz = p
        loss = trainer._loss_fn(
            cnp, fz,
            {"pixel_values": x, "conditioning_pixel_values": cond,
             "input_ids": ids},
            jax.random.key(0),
        )
        return x + loss.astype(x.dtype) * 1e-6

    if want("full"):
        device_ms("full loss fwd", full, (cn, frozen), img, l1=2, l2=6)


if __name__ == "__main__":
    main()
