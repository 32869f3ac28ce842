"""The decoder's single worst XLA op: conv3x3 512->512 @256^2 (the up1
upsample conv, 310 GF at 26% MXU). Fused kernel (O-split) vs XLA.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fused_upsample.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms  # noqa: E402

from genima_tpu.kernels.fused_conv import fused_conv3x3  # noqa: E402

DT = jnp.bfloat16


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for hw, cin, cout in [(256, 512, 512), (128, 512, 512), (512, 256, 256)]:
        x = jax.random.normal(jax.random.key(0), (1, hw, hw, cin), DT)
        w = jax.random.normal(jax.random.key(1), (3, 3, cin, cout), DT) * 0.02
        b = jnp.zeros((cout,), DT)
        fl = hw * hw * 9 * cin * cout * 2

        def xla(w, c):
            y = jax.lax.conv_general_dilated(
                c, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return c + jnp.mean(y).astype(c.dtype) * 1e-6

        def fused(w, c):
            y = fused_conv3x3(c, w, b)
            return c + jnp.mean(y).astype(c.dtype) * 1e-6

        tx = device_ms(f"xla   conv {hw}^2 {cin}->{cout}", xla, w, x,
                       l1=2, l2=10, flops=fl)
        tf_ = device_ms(f"fused conv {hw}^2 {cin}->{cout}", fused, w, x,
                        l1=2, l2=10, flops=fl)
        print(f"    -> speedup {tx / tf_:.2f}x\n", flush=True)


if __name__ == "__main__":
    main()
