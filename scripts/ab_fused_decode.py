"""Full SD VAE decode: conv_backend fused vs xla, slope-timed + numerics.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fused_decode.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms, zeros_init  # noqa: E402

from genima_tpu.nn.vae import AutoencoderKL, VAEConfig  # noqa: E402

DT = jnp.bfloat16


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = VAEConfig.sd()
    vx = AutoencoderKL(cfg, dtype=DT, conv_backend="xla")
    vf = AutoencoderKL(cfg, dtype=DT, conv_backend="fused")
    img = jnp.zeros((1, 512, 512, 3), DT)
    key = jax.random.key(0)
    params = zeros_init(vx, img, key)
    # random weights for the numerics check
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.key(1), len(leaves))
    params_r = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(k, a.shape, a.dtype)
         for k, a in zip(ks, leaves)],
    )
    lat = jax.random.normal(jax.random.key(2), (1, 64, 64, 4), DT)

    @jax.jit
    def dec_x(p, z):
        return vx.apply({"params": p}, z, method=vx.decode)

    @jax.jit
    def dec_f(p, z):
        return vf.apply({"params": p}, z, method=vf.decode)

    yx = np.asarray(dec_x(params_r, lat), np.float32)
    yf = np.asarray(dec_f(params_r, lat), np.float32)
    print(f"numerics: max|diff| = {np.abs(yx - yf).max():.3e} "
          f"(out range [{yx.min():.2f}, {yx.max():.2f}])", flush=True)

    def stage_x(p, z):
        return jnp.mean(vx.apply({"params": p}, z, method=vx.decode)) + z

    def stage_f(p, z):
        return jnp.mean(vf.apply({"params": p}, z, method=vf.decode)) + z

    tx = device_ms("decode [xla]", stage_x, params, lat, l1=2, l2=8)
    tf_ = device_ms("decode [fused]", stage_f, params, lat, l1=2, l2=8)
    print(f"speedup {tx / tf_:.2f}x", flush=True)


if __name__ == "__main__":
    main()
