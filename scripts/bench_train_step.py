"""Training-step benchmark: SD-turbo ControlNet fine-tune at 512^2
(BASELINE benchmark config 4), batch 1/2/4, chained scan timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def zeros_like_tree(shapes):
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig

    backend = sys.argv[1] if len(sys.argv) > 1 else "xla"
    use8 = "--8bit" in sys.argv
    gc = "--gc" in sys.argv
    mu16 = "--mu16" in sys.argv
    nonorm = "--nonorm" in sys.argv
    sizes = (1, 2, 4)
    for a in sys.argv[1:]:
        if a.startswith("--bs="):
            sizes = tuple(int(x) for x in a[5:].split(","))
    print(f"devices: {jax.devices()}  backend={backend} 8bit={use8} gc={gc} mu16={mu16} nonorm={nonorm}",
          flush=True)
    pipe = SDControlNetPipeline(backend=backend)
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    params = zeros_like_tree(shapes)
    trainer = ControlNetTrainer(
        pipe,
        TrainConfig(learning_rate=1e-5, max_grad_norm=1.0, use_8bit_adam=use8,
                    gradient_checkpointing=gc, adam_mu_bf16=mu16,
                    log_grad_norm=not nonorm),
    )
    state = None
    for bs in sizes:
        del state  # free the donated-through state before reallocating
        state = trainer.create_state(params)
        from genima_tpu.core.optim import optimizer_state_bytes

        print(f"  opt state: {optimizer_state_bytes(state.opt_state)/2**30:.2f} GiB",
              flush=True)
        batch = {
            "pixel_values": jnp.zeros((bs, 512, 512, 3), jnp.float32),
            "conditioning_pixel_values": jnp.zeros((bs, 512, 512, 3),
                                                   jnp.float32),
            "input_ids": jnp.zeros((bs, 77), jnp.int32),
        }
        t0 = time.time()
        state, m = trainer.train_step(state, batch, jax.random.key(0))
        _ = float(m["loss"])
        compile_s = time.time() - t0
        times = []
        for i in range(6):
            t0 = time.perf_counter()
            state, m = trainer.train_step(state, batch, jax.random.key(i))
            _ = float(m["loss"])  # host readback forces completion
            times.append(time.perf_counter() - t0)
        # chained: queue N steps, read back once — dispatch overlaps device
        # execution, so this is true sequential device throughput (the
        # per-call number above additionally pays the relay round-trip)
        n_chain = 10
        t0 = time.perf_counter()
        for i in range(n_chain):
            state, m = trainer.train_step(state, batch, jax.random.key(i))
        _ = float(m["loss"])
        chained_ms = (time.perf_counter() - t0) / n_chain * 1000
        print(
            f"bs={bs}: {min(times)*1000:8.1f} ms/step per-call | "
            f"chained {chained_ms:8.1f} ms/step "
            f"({chained_ms/bs:7.1f} ms/sample, compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
