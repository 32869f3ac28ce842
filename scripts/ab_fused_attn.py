"""A/B the packed flash-attention backend inside the full denoise step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fused_attn.py
"""

import sys

sys.path.insert(0, "/root/repo/scripts")
from ablate_r2 import build_step, timeit  # noqa: E402

import genima_tpu.nn.layers as L  # noqa: E402


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)

    fn, args = build_step("fused")
    timeit("cn+unet step [fused >=1024]", fn, args, 10)

    L.FUSED_MIN_SEQ = 256
    fn, args = build_step("fused")
    timeit("cn+unet step [fused >=256]", fn, args, 10)

    L.FUSED_MIN_SEQ = 1024
    fn, args = build_step("xla")
    timeit("cn+unet step [xla baseline re-run]", fn, args, 10)


if __name__ == "__main__":
    main()
