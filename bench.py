"""Benchmark: 4-cam tiled 256^2 generations/sec/chip, 5-step SD-turbo.

The north-star metric (BASELINE.md): one "generation" is a full Genima
diffusion-agent call — 5 ControlNet+UNet denoise steps at 512x512 (the 2x2
tile of 4x 256^2 cameras) + VAE decode + uint8 postprocess, batch 1, as one
jitted XLA program. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the north-star target of 10 gens/sec (the
<100 ms p50 closed-loop step on v5e; the reference publishes no numbers —
BASELINE.json published: {}).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline

    print(f"devices: {jax.devices()}", file=sys.stderr)
    pipe = SDControlNetPipeline()  # full SD-turbo geometry, bf16
    key = jax.random.key(0)

    t0 = time.time()
    params = pipe.init_params(key, image_size=512, fast=True)
    print(f"param init: {time.time() - t0:.1f}s", file=sys.stderr)

    embeds = jnp.zeros((1, 77, 1024), jnp.bfloat16)
    cond = jax.random.uniform(jax.random.key(1), (1, 512, 512, 3), jnp.float32)
    latents = pipe.init_latents(jax.random.key(2), 1, 512, 512)

    num_steps = 5
    t0 = time.time()
    img = pipe.generate(params, cond, embeds, latents, num_inference_steps=num_steps)
    img.block_until_ready()
    print(f"compile + first gen: {time.time() - t0:.1f}s", file=sys.stderr)

    # timed runs — distinct inputs per iteration so no layer of the stack can
    # dedupe/cache identical executions
    n_warm, n_timed = 3, 20
    all_latents = [
        pipe.init_latents(jax.random.key(100 + i), 1, 512, 512)
        for i in range(n_warm + n_timed)
    ]
    jax.block_until_ready(all_latents)
    import numpy as _np

    for i in range(n_warm):
        img = pipe.generate(
            params, cond, embeds, all_latents[i], num_inference_steps=num_steps
        )
        _ = _np.asarray(img[0, 0, 0])  # force completion (axon relay)

    # A host readback per iteration forces real completion — under the axon
    # relay block_until_ready alone returns before the computation finishes.
    import numpy as np

    times = []
    for i in range(n_timed):
        t0 = time.perf_counter()
        img = pipe.generate(
            params, cond, embeds, all_latents[n_warm + i],
            num_inference_steps=num_steps,
        )
        _ = np.asarray(img[0, 0, 0])
        times.append(time.perf_counter() - t0)

    times.sort()
    p50 = times[len(times) // 2]
    gens_per_sec = 1.0 / p50
    print(
        f"p50 latency: {p50 * 1000:.1f} ms | min {times[0]*1000:.1f} | "
        f"max {times[-1]*1000:.1f}",
        file=sys.stderr,
    )

    target_gens_per_sec = 10.0  # <100 ms north-star
    print(
        json.dumps(
            {
                "metric": "tiled_256x4_5step_sdturbo_gens_per_sec_chip",
                "value": round(gens_per_sec, 3),
                "unit": "gens/sec",
                "vs_baseline": round(gens_per_sec / target_gens_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
