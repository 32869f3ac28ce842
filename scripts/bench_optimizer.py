"""Slope-timed optimizer pass in isolation: is clip+adamw at the HBM roofline?

PERF.md round 3 left a ~15 ms gap between the measured bs=1 train step
(57.3 ms) and the fwd+bwd piece-sum (~42 ms), attributed to
grad-clip/optimizer HBM traffic. This measures exactly that slice — the
global-norm clip + AdamW update + apply on the REAL ControlNet-sized f32
tree, scan-chained with the state donated — and compares it against the
bandwidth roofline:

  norm pass:   read grads                      (1 x P f32)
  update pass: read grads, mu, nu, params      (4 x P f32)
               write mu, nu, params            (3 x P f32)

so 8 x P x 4 bytes minimum HBM traffic. If the measurement sits on that
line, the optimizer is already speed-of-light and the remaining train-step
gap is not recoverable by a fused kernel; if it sits well above, a Pallas
fused clip+adamw is worth building.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_optimizer.py [--mu16] [--nonorm]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


V5E_HBM_GBS = 819.0  # v5e spec HBM bandwidth


def main():
    from genima_tpu.diffusion.pipeline import SDControlNetPipeline
    from genima_tpu.diffusion.training import ControlNetTrainer, TrainConfig

    mu16 = "--mu16" in sys.argv
    nonorm = "--nonorm" in sys.argv
    print(f"devices: {jax.devices()} mu16={mu16} nonorm={nonorm}", flush=True)

    pipe = SDControlNetPipeline()
    cn_shapes = jax.eval_shape(
        lambda: pipe.init_params(jax.random.key(0), image_size=512, fast=False)
    )["controlnet"]
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(cn_shapes)
    )
    trainer = ControlNetTrainer(
        pipe,
        TrainConfig(
            learning_rate=1e-5, max_grad_norm=1.0, adam_mu_bf16=mu16,
            log_grad_norm=not nonorm,
        ),
    )
    tx = trainer.tx

    opt_shapes = jax.eval_shape(
        lambda: tx.init(
            jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                   cn_shapes)
        )
    )

    @jax.jit
    def fresh():
        z = lambda s: jnp.zeros(s.shape, s.dtype)
        return (
            jax.tree_util.tree_map(z, cn_shapes),
            jax.tree_util.tree_map(z, opt_shapes),
            jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-6, s.dtype),
                                   cn_shapes),
        )

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def run(params, opt_state, grads, length):
        # grads is a REAL HBM-resident tree (an input, like the backward
        # pass's output in the actual step) — each iteration reads it in
        # full for both the norm and the update; the per-iteration epsilon
        # keeps the norm loop-variant so nothing hoists out of the scan
        def body(carry, i):
            p, o = carry
            g = jax.tree_util.tree_map(
                lambda x: x + (1e-9 * (i + 1)).astype(x.dtype), grads
            )
            updates, o = tx.update(g, o, p)
            p = optax.apply_updates(p, updates)
            norm = optax.global_norm(g) if not nonorm else jnp.float32(0)
            return (p, o), norm

        (p, o), norms = jax.lax.scan(
            body, (params, opt_state), jnp.arange(length)
        )
        return p, o, jnp.sum(norms)

    def measure(length, calls=4):
        p, o, g = fresh()
        p, o, out = run(p, o, g, length)
        _ = float(np.asarray(out))
        times = []
        for _i in range(calls):
            t0 = time.perf_counter()
            p, o, out = run(p, o, g, length)
            _ = float(np.asarray(out))
            times.append(time.perf_counter() - t0)
        del p, o, g
        return min(times)

    l1, l2 = 4, 16
    t1 = measure(l1)
    t2 = measure(l2)
    ms = (t2 - t1) / (l2 - l1) * 1000

    traffic = n_params * (
        (1 + 4 + 3) * 4  # norm read + update reads/writes, all f32
        if not mu16
        else (1 * 4 + (3 * 4 + 1 * 2) + (2 * 4 + 1 * 2))  # mu bf16 r/w
    )
    if nonorm:
        traffic -= n_params * 4
    roofline_ms = traffic / (V5E_HBM_GBS * 1e9) * 1e3
    print(
        f"clip+adamw slope: {ms:6.2f} ms/step over {n_params / 1e6:.1f}M "
        f"params | roofline {roofline_ms:.2f} ms "
        f"({traffic / 1e9:.2f} GB @ {V5E_HBM_GBS:.0f} GB/s) | "
        f"ratio {ms / roofline_ms:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
