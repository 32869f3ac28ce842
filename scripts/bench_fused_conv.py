"""A/B the fused GN-SiLU-conv3x3 Pallas kernel vs the XLA chain on the SD
VAE decoder shapes (slope-timed).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_conv.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms  # noqa: E402

from genima_tpu.kernels.fused_conv import (  # noqa: E402
    _xla_reference,
    fold_group_norm,
    fused_conv3x3,
)

DT = jnp.bfloat16


def main():
    print(f"devices: {jax.devices()}", flush=True)

    # (name, H/W, Cin, Cout, gn, skip, res)
    cases = [
        ("up3 conv 512^2 128->128 gn", 512, 128, 128, True, False, True),
        ("up3 conv1 512^2 256->128 gn+skip", 512, 256, 128, True, True, False),
        ("up2 conv 256^2 256->256 gn", 256, 256, 256, True, False, True),
        ("up2 conv1 256^2 512->256 gn+skip", 256, 512, 256, True, True, False),
        ("up1 conv 128^2 512->512 gn", 128, 512, 512, True, False, True),
        ("upsample conv 512^2 256->256 plain", 512, 256, 256, False, False, False),
        ("conv_out 512^2 128->3 gn", 512, 128, 3, True, False, False),
    ]
    ks = jax.random.split(jax.random.key(0), 8)
    for name, hw, cin, cout, gn, skip, res in cases:
        x = jax.random.normal(ks[0], (1, hw, hw, cin), DT)
        w = (jax.random.normal(ks[1], (3, 3, cin, cout), DT) * 0.05)
        b = jnp.zeros((cout,), DT)
        gamma = jnp.ones((cin,), jnp.float32)
        beta = jnp.zeros((cin,), jnp.float32)
        wskip = (jax.random.normal(ks[2], (cin, cout), DT) * 0.05) if skip else None
        resid = jax.random.normal(ks[3], (1, hw, hw, cout), DT) if res else None
        flops = hw * hw * cout * 2 * (9 * cin + (cin if skip else 0))

        def xla_chain(p, c):
            ww, sk, rr = p
            if gn:
                scale, shift = fold_group_norm(c, gamma, beta, 32, 1e-6)
            else:
                scale = shift = None
            y = _xla_reference(c, ww, b, scale, shift, sk, rr)
            return c + jnp.mean(y).astype(c.dtype) * 1e-6

        def fused(p, c):
            ww, sk, rr = p
            if gn:
                scale, shift = fold_group_norm(c, gamma, beta, 32, 1e-6)
            else:
                scale = shift = None
            y = fused_conv3x3(c, ww, b, scale, shift, sk, rr)
            return c + jnp.mean(y).astype(c.dtype) * 1e-6

        p = (w, wskip, resid)
        t_x = device_ms(f"xla   {name}", xla_chain, p, x, l1=2, l2=14,
                        flops=flops)
        t_f = device_ms(f"fused {name}", fused, p, x, l1=2, l2=14,
                        flops=flops)
        print(f"    -> speedup {t_x / t_f:.2f}x\n", flush=True)


if __name__ == "__main__":
    main()
