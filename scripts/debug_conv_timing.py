"""Isolate the conv-timing discrepancy: full decode (ablate_r2 style) vs my
per-stage chains — zeros vs random inputs, zeros vs random weights."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from ablate_r2 import build_vae, timeit, zeros_init  # noqa: E402

DT = jnp.bfloat16


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # 1. exact ablate_r2 full decode (zeros params, zeros latents)
    fn, args = build_vae()
    timeit("vae decode [ablate_r2 exact]", fn, args, 5)

    # 2. same but random latent input
    vp, lat = args
    lat_r = jax.random.normal(jax.random.key(9), lat.shape, lat.dtype)
    timeit("vae decode [random latents]", fn, (vp, lat_r), 5)

    # 3. same but random weights
    vp_r = jax.tree_util.tree_map(
        lambda a: 0.02 * jax.random.normal(jax.random.key(1), a.shape, a.dtype),
        vp,
    )
    timeit("vae decode [random weights+latents]", fn, (vp_r, lat_r), 5)

    # 4. single conv 64x64 512->512, zeros and random
    w = jnp.zeros((3, 3, 512, 512), DT)
    x = jnp.zeros((1, 64, 64, 512), DT)

    @jax.jit
    def conv_scan(w, x):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y * 1e-3, ()
        y, _ = jax.lax.scan(body, x, None, length=8)
        return y

    timeit("conv 64x512->512 [zeros]", conv_scan, (w, x), 8)
    xr = jax.random.normal(jax.random.key(2), x.shape, DT)
    wr = 0.02 * jax.random.normal(jax.random.key(3), w.shape, DT)
    timeit("conv 64x512->512 [random]", conv_scan, (wr, xr), 8)

    # 5. the carry-tap variant used in profile_vae (c + mean(y)*eps keeps
    # input shape) vs direct carry
    @jax.jit
    def conv_scan_tap(w, x):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return c + jnp.mean(y).astype(c.dtype) * 1e-6, ()
        y, _ = jax.lax.scan(body, x, None, length=8)
        return y

    timeit("conv 64x512->512 [tap carry, zeros]", conv_scan_tap, (w, x), 8)
    timeit("conv 64x512->512 [tap carry, random]", conv_scan_tap, (wr, xr), 8)


if __name__ == "__main__":
    main()
