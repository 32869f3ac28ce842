"""Sweep packed-attention block sizes per Genima shape, slope-timed.

Shapes: SD2.1 UNet/CN self-attention at 64x64 (4096 tok, 5h), 32x32
(1024 tok, 10h), 16x16 (256 tok, 20h); VAE mid (4096 tok, 1h x 512d via
XLA). Compares XLA fused attention vs the packed kernel at several
block_q, on the full packed (B,S,C) -> (B,S,C) boundary including the
q/k/v and out projections the pipeline pays.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_packed_attn.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/scripts")
from tputime import device_ms  # noqa: E402

from genima_tpu.kernels.packed_attention import packed_flash_attention  # noqa: E402

DT = jnp.bfloat16


def main():
    print(f"devices: {jax.devices()}", flush=True)

    for s, heads in [(4096, 5), (1024, 10), (256, 20)]:
        c = heads * 64
        q = jax.random.normal(jax.random.key(0), (1, s, c), DT)
        k = jax.random.normal(jax.random.key(1), (1, s, c), DT)
        v = jax.random.normal(jax.random.key(2), (1, s, c), DT)
        # FLOPs: 2 matmuls of S x S x D per head
        fl = heads * 2 * 2 * s * s * 64
        # attention floor on v5e: D=64 contraction/output half-fills the MXU
        print(f"--- S={s} H={heads} C={c}  (flop-ideal "
              f"{fl / 197e9:.3f} ms, D=64 floor ~{2 * fl / 197e9:.3f}) ---",
              flush=True)

        def xla(kv, qq):
            kk, vv = kv
            b, ss, cc = qq.shape
            o = jax.nn.dot_product_attention(
                qq.reshape(b, ss, heads, 64),
                kk.reshape(b, ss, heads, 64),
                vv.reshape(b, ss, heads, 64),
            )
            return o.reshape(b, ss, cc) * 1e-3 + qq

        device_ms(f"xla dpa S={s}", xla, (k, v), q, l1=2, l2=22, flops=fl)

        for bq in [128, 256, 512]:
            if bq > s:
                continue

            def packed(kv, qq, bq=bq):
                kk, vv = kv
                o = packed_flash_attention(qq, kk, vv, heads, bq)
                return o * 1e-3 + qq

            device_ms(f"packed bq={bq} S={s}", packed, (k, v), q,
                      l1=2, l2=22, flops=fl)


if __name__ == "__main__":
    main()
