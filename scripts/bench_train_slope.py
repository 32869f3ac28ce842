"""Slope-timed ControlNet train step (512^2, bs=1): the relay-independent
device time. Chains the FULL train step (grads + clip + adamw update) inside
one lax.scan, measured at two lengths; the slope cancels the per-call relay
round-trip that the chained-loop number in bench_train_step.py still hides.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_slope.py [--mu16] [--nonorm] [--gc]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig

    mu16 = "--mu16" in sys.argv
    nonorm = "--nonorm" in sys.argv
    gc = "--gc" in sys.argv
    bs = 1
    for a in sys.argv[1:]:
        if a.startswith("--bs="):
            bs = int(a.split("=")[1])
    print(f"devices: {jax.devices()} mu16={mu16} nonorm={nonorm} gc={gc} bs={bs}",
          flush=True)

    pipe = SDControlNetPipeline()
    shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    trainer = ControlNetTrainer(
        pipe,
        TrainConfig(
            learning_rate=1e-5, max_grad_norm=1.0, adam_mu_bf16=mu16,
            log_grad_norm=not nonorm, gradient_checkpointing=gc,
        ),
    )
    state0 = trainer.create_state(params)
    frozen = trainer._frozen
    # keep only host-side SHAPES of the state so it can be re-zeroed per
    # call (the chain donates its input state); drop the full pipeline tree
    state_shapes = jax.eval_shape(lambda: state0)
    del params, state0

    @jax.jit
    def fresh_state():
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), state_shapes
        )
    batch = {
        "pixel_values": jnp.zeros((bs, 512, 512, 3), jnp.float32),
        "conditioning_pixel_values": jnp.zeros((bs, 512, 512, 3), jnp.float32),
        "input_ids": jnp.zeros((bs, 77), jnp.int32),
    }

    def chain(length):
        # frozen passed as an ARG — closing over it captures 5 GB of
        # constants into the lowering. State DONATED **and returned**: with a
        # scalar-only output XLA cannot alias the donated 4.3 GB optimizer
        # state anywhere ("donated buffers were not usable") and input +
        # scan-carry copies exhaust HBM.
        @partial(jax.jit, donate_argnums=(0,))
        def run(state, frozen, batch, key):
            def body(carry, i):
                st, k = carry
                k, sub = jax.random.split(k)
                st, metrics = trainer._step_impl(st, frozen, batch, sub)
                return (st, k), metrics["loss"]

            (st, _), losses = jax.lax.scan(
                body, (state, key), jnp.arange(length)
            )
            return st, jnp.sum(losses)

        return run

    def measure(fn, calls=4):
        st = fresh_state()
        st, out = fn(st, frozen, batch, jax.random.key(0))
        _ = float(np.asarray(out))  # compile + settle
        times = []
        for i in range(calls):
            t0 = time.perf_counter()
            st, out = fn(st, frozen, batch, jax.random.key(i))
            _ = float(np.asarray(out))
            times.append(time.perf_counter() - t0)
        del st
        return min(times)

    l1, l2 = 2, 8
    t0 = time.time()
    f1, f2 = chain(l1), chain(l2)
    t1 = measure(f1)
    t2 = measure(f2)
    ms = (t2 - t1) / (l2 - l1) * 1000
    print(
        f"train step slope: {ms:8.1f} ms/step ({ms / bs:7.1f} ms/sample) | "
        f"call floor {t1 * 1000 - l1 * ms:6.1f} ms | total setup "
        f"{time.time() - t0:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
