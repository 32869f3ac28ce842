"""A/B: packed kernel for cross-attention too (sk=77, long q side).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_fused_cross.py
"""

import sys

sys.path.insert(0, "/root/repo/scripts")
from ablate_r2 import build_step, timeit  # noqa: E402

import genima_tpu.nn.layers as L  # noqa: E402


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)

    # patch: 'fused' applies to cross-attention as well (same seq threshold
    # on the query side)
    orig = L.resolve_backend
    L.resolve_backend = lambda backend, is_cross: (
        "fused" if backend == "fused" else orig(backend, is_cross)
    )
    fn, args = build_step("fused")
    timeit("cn+unet step [fused self+cross]", fn, args, 10)
    L.resolve_backend = orig

    fn, args = build_step("fused")
    timeit("cn+unet step [fused self only]", fn, args, 10)


if __name__ == "__main__":
    main()
