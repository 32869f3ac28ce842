"""Per-stage fused-vs-XLA A/B on the exact decoder levels, to find which
levels the fused resnet kernel should cover.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fused_stages.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms, zeros_init  # noqa: E402

from genima_tpu.nn.fused_blocks import FusedResnetBlock2D  # noqa: E402
from genima_tpu.nn.layers import ResnetBlock2D  # noqa: E402

DT = jnp.bfloat16


class Stage(nn.Module):
    out_ch: int
    fused: bool

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            if self.fused:
                x = FusedResnetBlock2D(self.out_ch, dtype=DT, name=f"r{i}")(x)
            else:
                x = ResnetBlock2D(self.out_ch, use_time_emb=False, eps=1e-6,
                                  dtype=DT, name=f"r{i}")(x)
        return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    specs = [
        ("up0 @64x512", 64, 512, 512),
        ("up1 @128x512", 128, 512, 512),
        ("up2 @256 512->256", 256, 512, 256),
        ("up3 @512 256->128", 512, 256, 128),
    ]
    for name, hw, cin, cout in specs:
        x = jax.random.normal(jax.random.key(1), (1, hw, hw, cin), DT)
        times = {}
        for fused in (False, True):
            st = Stage(cout, fused)
            p = zeros_init(st, x)
            times[fused] = device_ms(
                f"{'fused' if fused else 'xla  '} {name}",
                lambda p, c, st=st: st.apply({"params": p}, c), p, x,
                l1=2, l2=10)
        print(f"    -> speedup {times[False] / times[True]:.2f}x\n",
              flush=True)


if __name__ == "__main__":
    main()
