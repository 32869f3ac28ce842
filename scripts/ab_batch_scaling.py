"""Where does batched serving lose its scaling? Stage-level batch sweep.

Round-4 sweep data (scripts/bench_fused_step.py --batch=N) showed the
lockstep control step at 112 ms/env for N=2/4 vs 81 ms serial, recovering
to 66.9 ms/env at N=8. This script isolates the regression per stage:

  1. full SD generate (5-step denoise + decode) at batch N
  2. VAE decode alone at batch N
  3. ACT controller alone at batch N
  4. self-attention per UNet level x batch x implementation
     (auto-dispatch packed kernel / forced streaming / XLA dpa)

Suspect: kernels/packed_attention.py::_forward switches from the
resident-K/V kernel to the streaming (online-softmax) kernel when the
VMEM estimate crosses 14 MB -- the 4096x320 level crosses exactly at
batch >= 2 (see _resident_vmem_bytes: K/V double-buffer at b > 1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_batch_scaling.py
     [--stages] [--attn] (default: both)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms  # noqa: E402

DT = jnp.bfloat16
BATCHES = (1, 2, 4, 8)


def stage_sweep():
    from types import SimpleNamespace

    from genima_tpu.control.policy import GenimaACTAgent
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline

    pipe = SDControlNetPipeline()
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    dparams = jax.tree_util.tree_map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )
    controller = GenimaACTAgent()
    cshapes = jax.eval_shape(lambda: controller.init_params(jax.random.key(1)))
    cparams, clip_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), cshapes
    )

    for n in BATCHES:
        cond = jnp.zeros((n, 512, 512, 3), jnp.uint8)
        embeds = jnp.zeros((n, 77, 1024), DT)
        lat = pipe.init_latents(jax.random.key(2), n, 512, 512)

        def gen(p, l):
            return pipe.generate(p, cond, embeds, l, num_inference_steps=5)

        device_ms(f"generate (denoise+decode) N={n}", gen, dparams, lat,
                  l1=2, l2=8)

        def dec(p, l):
            return pipe._decode_latents(p, l)

        device_ms(f"vae decode N={n}", dec, dparams, lat, l1=2, l2=10)

        imgs = jnp.zeros((n, 4, 256, 256, 3), jnp.float32)
        qpos = jnp.zeros((n, controller.act_cfg.state_dim))
        lang = jnp.zeros((n, 77), jnp.int32)

        def act(p, im):
            return controller._act_impl(p, clip_params, im, qpos, lang)

        device_ms(f"ACT forward N={n}", act, cparams, imgs, l1=4, l2=24)


def attn_sweep():
    import genima_tpu.kernels.packed_attention as pa

    for s, heads in [(4096, 5), (1024, 10), (256, 20)]:
        c = heads * 64
        for n in BATCHES:
            q = jax.random.normal(jax.random.key(0), (n, s, c), DT)
            k = jax.random.normal(jax.random.key(1), (n, s, c), DT)
            v = jax.random.normal(jax.random.key(2), (n, s, c), DT)
            fl = n * heads * 2 * 2 * s * s * 64

            def auto(kv, qq):
                kk, vv = kv
                o = pa.packed_flash_attention(qq, kk, vv, heads, 256)
                return o * 1e-3 + qq

            def streaming(kv, qq):
                kk, vv = kv
                o = pa._forward_streaming(qq, kk, vv, heads, 256, False)
                return o * 1e-3 + qq

            def xla(kv, qq):
                kk, vv = kv
                b, ss, cc = qq.shape
                o = jax.nn.dot_product_attention(
                    qq.reshape(b, ss, heads, 64),
                    kk.reshape(b, ss, heads, 64),
                    vv.reshape(b, ss, heads, 64),
                )
                return o.reshape(b, ss, cc) * 1e-3 + qq

            device_ms(f"attn S={s} H={heads} N={n} auto", auto, (k, v), q,
                      l1=2, l2=14, flops=fl)
            device_ms(f"attn S={s} H={heads} N={n} stream", streaming,
                      (k, v), q, l1=2, l2=14, flops=fl)
            device_ms(f"attn S={s} H={heads} N={n} xla", xla, (k, v), q,
                      l1=2, l2=14, flops=fl)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    which = sys.argv[1:] or ["--stages", "--attn"]
    if "--stages" in which:
        stage_sweep()
    if "--attn" in which:
        attn_sweep()
    print("ABDONE", flush=True)


if __name__ == "__main__":
    main()
