"""Compiled-kernel parity on the real TPU (interpret-mode tests prove the
math; this proves the Mosaic lowering): packed flash attention forward,
the lse-emitting training forward, the flash backward, and the fused
GN-SiLU-conv kernel, each vs its XLA reference at SD shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_parity_check.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.kernels import packed_attention as PA
from genima_tpu.kernels import fused_conv as FC

DT = jnp.bfloat16


def check(name, got, want, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    ok = err <= atol
    print(f"{name:44s} max|diff|={err:.3e} (ref scale {scale:.2f}) "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ok = True

    for s, heads in [(4096, 5), (1024, 10), (256, 20)]:
        c = heads * 64
        ks = jax.random.split(jax.random.key(s), 3)
        q = jax.random.normal(ks[0], (1, s, c), DT)
        k = jax.random.normal(ks[1], (1, s, c), DT)
        v = jax.random.normal(ks[2], (1, s, c), DT)
        got = jax.jit(
            lambda q, k, v: PA.packed_flash_attention(q, k, v, heads)
        )(q, k, v)
        want = PA._xla_reference(q, k, v, heads)
        ok &= check(f"packed fwd S={s}", got, want, 0.05)

        o, lse = jax.jit(
            lambda q, k, v: PA._forward_with_lse(q, k, v, heads, 128, False)
        )(q, k, v)
        ok &= check(f"lse fwd S={s}", o, want, 0.05)

        def loss_k(q, k, v):
            return (PA.packed_flash_attention(q, k, v, heads) ** 2).sum()

        def loss_r(q, k, v):
            return (PA._xla_reference(q, k, v, heads) ** 2).sum()

        g1 = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
        for nm, a, b in zip("qkv", g1, g2):
            sc = float(np.abs(np.asarray(b, np.float32)).max())
            ok &= check(f"flash bwd d{nm} S={s}", a, b, 0.05 * max(sc, 1.0))

    # fused conv at the real decoder shapes
    for hw, cin, cout, res in [(64, 512, 512, True), (512, 128, 128, True),
                               (256, 512, 256, False)]:
        ks = jax.random.split(jax.random.key(hw + cin), 7)
        x = jax.random.normal(ks[0], (1, hw, hw, cin), DT)
        w = jax.random.normal(ks[1], (3, 3, cin, cout), DT) * 0.05
        b = jax.random.normal(ks[2], (cout,), DT) * 0.1
        gamma = jnp.ones((cin,), jnp.float32)
        beta = jnp.zeros((cin,), jnp.float32)
        wskip = (
            jax.random.normal(ks[3], (cin, cout), DT) * 0.05
            if cin != cout else None
        )
        resid = (
            jax.random.normal(ks[4], (1, hw, hw, cout), DT) if res else None
        )
        scale, shift = FC.fold_group_norm(x, gamma, beta, 32, 1e-6)
        got = jax.jit(
            lambda x, w, b, s, t: FC.fused_conv3x3(x, w, b, s, t, wskip, resid)
        )(x, w, b, scale, shift)
        want = FC._xla_reference(x, w, b, scale, shift, wskip, resid)
        sc = float(np.abs(np.asarray(want, np.float32)).max())
        ok &= check(f"fused conv {hw}^2 {cin}->{cout}", got, want,
                    0.05 * max(sc, 1.0))

    print("ALL OK" if ok else "FAILURES", flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
