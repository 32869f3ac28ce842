"""Slope-timed FusedGenimaStep: the north-star closed-loop control program.

One XLA program: 5-step ControlNet denoise (512^2 tiled) -> VAE decode ->
uint8 -> untile to 4x256^2 cams -> ImageNet norm -> full ACT forward ->
20-action chunk. Round 2 measured 81.1 ms device; this script keeps the
measurement reproducible and reflects serving-layout (bf16-stored) params.

--batch=N times BatchedGenimaStep instead: the lockstep-parallel control
step (eval/parallel.py) serving N environments per program; reports
ms/step per environment.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_step.py
"""

from __future__ import annotations

import sys
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from genima_tpu.control.policy import GenimaACTAgent
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.eval.fused import FusedGenimaStep
    from genima_tpu.eval.parallel import BatchedGenimaStep

    n = 1
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            n = int(a.split("=")[1])

    print(f"devices: {jax.devices()}", flush=True)
    pipe = SDControlNetPipeline()

    # serving layout: zeros on device, f32 leaves stored bf16 (timing is
    # value-independent; eval agents pre-cast the same way)
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
    cshapes = jax.eval_shape(
        lambda: controller.init_params(jax.random.key(1))
    )
    cparams, clip_params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), cshapes
    )

    if n == 1:
        fused = FusedGenimaStep(SimpleNamespace(pipe=pipe), controller)
        step_impl = fused._step_impl
    else:
        batched = BatchedGenimaStep(SimpleNamespace(pipe=pipe), controller)
        step_impl = batched._step_impl

    tiled_u8 = jnp.zeros((n, 512, 512, 3), jnp.uint8)
    embeds = jnp.zeros((n, 77, 1024), jnp.bfloat16)
    lat0 = pipe.init_latents(jax.random.key(2), n, 512, 512)
    qpos = jnp.zeros((n, controller.act_cfg.state_dim))
    lang = jnp.zeros((n, 77), jnp.int32)

    def chain(dp, cp, clp, length):
        def body(carry, i):
            fb = carry
            lat = (
                jax.random.normal(
                    jax.random.fold_in(jax.random.key(7), i),
                    lat0.shape, lat0.dtype,
                )
                + fb * 1e-9
            )
            actions, _ = step_impl(
                dp, cp, clp, tiled_u8, embeds, lat, qpos, lang,
                num_inference_steps=5,
            )
            return actions[0, 0, 0].astype(jnp.float32), ()

        fb, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                             jnp.arange(length))
        return fb

    f = jax.jit(chain, static_argnames=("length",))
    runs = {}
    t0 = time.time()
    for length in (4, 16):
        _ = float(np.asarray(f(dparams, cparams, clip_params, length=length)))
        times = []
        for _ in range(4):
            t1 = time.perf_counter()
            _ = float(
                np.asarray(f(dparams, cparams, clip_params, length=length))
            )
            times.append(time.perf_counter() - t1)
        runs[length] = min(times)
    ms = (runs[16] - runs[4]) / 12 * 1000 / n
    label = (
        "FusedGenimaStep (obs->diffusion->untile->ACT)"
        if n == 1
        else f"BatchedGenimaStep x{n} (lockstep envs, per env)"
    )
    print(
        f"{label}: {ms:6.1f} ms/step "
        f"({1000/ms:5.2f} steps/s) | total {time.time()-t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
