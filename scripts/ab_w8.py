"""A/B: int8 weight-only transformer matmuls in the SD denoise loop.

Slope-times the flagship 5-step generate (bench.py geometry, 512^2, bs=1)
with backend "fused" vs "fused+w8" (kernels/w8_matmul.py) — measuring
whether halving the transformer-block weight HBM traffic (int8 vs the bf16
the MXU reads either way) is visible end-to-end at batch 1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_w8.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_generate(pipe, params, lengths=(4, 16), calls=4):
    cond = jax.random.uniform(jax.random.key(1), (1, 512, 512, 3))
    embeds = jnp.zeros((1, 77, 1024), jnp.bfloat16)
    lat0 = pipe.init_latents(jax.random.key(2), 1, 512, 512)

    def chain(p, length):
        def body(carry, i):
            fb = carry
            lat = (
                jax.random.normal(
                    jax.random.fold_in(jax.random.key(7), i),
                    lat0.shape, lat0.dtype,
                )
                + fb * 1e-9
            )
            img = pipe.generate(p, cond, embeds, lat, num_inference_steps=5)
            return img[0, 0, 0, 0].astype(jnp.float32), ()

        fb, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                             jnp.arange(length))
        return fb

    f = jax.jit(chain, static_argnames=("length",))
    runs = {}
    for length in lengths:
        _ = float(np.asarray(f(params, length=length)))
        times = []
        for _ in range(calls):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(params, length=length)))
            times.append(time.perf_counter() - t0)
        runs[length] = min(times)
    l1, l2 = lengths
    return (runs[l2] - runs[l1]) / (l2 - l1) * 1000


def main():
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.weights.quantize import quantize_pipeline_params

    print(f"devices: {jax.devices()}", flush=True)

    for backend in ("fused", "fused+w8"):
        pipe = SDControlNetPipeline(backend=backend)
        shapes = jax.eval_shape(
            lambda p=pipe: p.init_params(
                jax.random.key(0), image_size=512, fast=False
            )
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
        if backend.endswith("+w8"):
            params = jax.jit(quantize_pipeline_params)(params)
        jax.block_until_ready(params)
        t0 = time.time()
        ms = slope_generate(pipe, params)
        print(
            f"{backend:10s}: {ms:7.1f} ms/gen ({1000/ms:5.2f} gens/s) | "
            f"total {time.time()-t0:.0f}s",
            flush=True,
        )
        del params


if __name__ == "__main__":
    main()
