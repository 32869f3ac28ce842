"""Dataset-rendering throughput on TPU: frames/sec through the jitted
sphere renderer + both composites (the Stage-B hot loop, reference
``render/render_data.py:235-323`` — pyrender/EGL there, one process per
episode; here one XLA program renders a whole batch of (timestep, camera)
frames).

Slope-timed like bench.py: K batches scan-chained inside one program with
iteration-dependent sphere centers (nothing dedupable), measured at two
chain lengths so the per-call relay round-trip cancels.

Usage: python scripts/bench_render.py [--batch=64] [--size=256]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.rendering.render_data import _render_batch


def main() -> None:
    batch, size = 64, 256
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--size="):
            size = int(a.split("=")[1])
    n_spheres = 4  # gripper + joints 1/3/5 (cfgs/render.yaml)

    rng = np.random.default_rng(0)
    intr = np.tile(
        np.array(
            [[175.0, 0, size / 2], [0, 175.0, size / 2], [0, 0, 1]], np.float32
        ),
        (batch, 1, 1),
    )
    pose = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    pose[:, 2, 3] = -1.0  # camera 1 m back
    centers = rng.normal(0, 0.15, (batch, n_spheres, 3)).astype(np.float32)
    rots = np.tile(np.eye(3, dtype=np.float32), (batch, n_spheres, 1, 1))
    radii = np.full((batch, n_spheres), 0.05, np.float32)
    stripes = rng.uniform(0, 1, (batch, n_spheres, 3)).astype(np.float32)
    factors = np.ones((batch, n_spheres, 3), np.float32)
    rgbs = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    texs = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    blends = rng.uniform(0.7, 1.0, (batch,)).astype(np.float32)

    args = tuple(
        jnp.asarray(x)
        for x in (
            intr, pose, centers, rots, radii, stripes, factors, rgbs, texs,
            blends,
        )
    )

    t0 = time.time()
    full, rnd = _render_batch(*args, height=size, width=size)
    jax.block_until_ready((full, rnd))
    print(f"compile + first batch: {time.time() - t0:.1f}s", file=sys.stderr)

    def scan_renders(args, length):
        (intr, pose, centers, rots, radii, stripes, factors, rgbs, texs,
         blends) = args

        def body(carry, i):
            c = centers + carry * 1e-9 + i.astype(jnp.float32) * 1e-7
            full, rnd = _render_batch(
                intr, pose, c, rots, radii, stripes, factors, rgbs, texs,
                blends, height=size, width=size,
            )
            return (
                full[0, 0, 0, 0].astype(jnp.float32)
                + rnd[0, 0, 0, 0].astype(jnp.float32)
            ), ()

        fb, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(length)
        )
        return fb

    f = jax.jit(scan_renders, static_argnames=("length",))
    runs = {}
    for length in (3, 9):
        _ = float(np.asarray(f(args, length)))  # compile
        times = []
        for _i in range(4):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(args, length)))
            times.append(time.perf_counter() - t0)
        runs[length] = min(times)
    per_batch_s = (runs[9] - runs[3]) / 6
    frames_per_sec = batch / per_batch_s
    print(
        f"render throughput: {frames_per_sec:,.0f} frames/sec "
        f"(batch {batch} at {size}x{size}, {n_spheres} spheres, both "
        f"composites; {per_batch_s * 1000:.2f} ms/batch, slope-timed)"
    )


if __name__ == "__main__":
    main()
