"""In-program ablations: what does each op class cost inside the REAL
cn+unet denoise step and VAE decode?

Isolated chains overstate per-piece costs (scripts/profile_r2.py); here we
keep the full program and knock out one op class at a time (identity
attention / identity groupnorm), giving the exact upper bound a fused kernel
for that class could win.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_r2.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import genima_tpu.nn.layers as L
import genima_tpu.nn.unet as U
import genima_tpu.nn.vae as V
from genima_tpu.nn.controlnet import ControlNetModel
from genima_tpu.nn.unet import UNetConfig, UNet2DConditionModel
from genima_tpu.nn.vae import AutoencoderKL, VAEConfig

DT = jnp.bfloat16


def zeros_init(module, *args):
    shapes = jax.eval_shape(
        lambda *a: module.init(jax.random.key(0), *a), *args
    )["params"]
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def timeit(name, fn, args, length, calls=4):
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    compile_s = time.time() - t0
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        times.append(time.perf_counter() - t0)
    ms = min(times) / length * 1000
    print(f"{name:48s} {ms:8.3f} ms/iter (compile {compile_s:.0f}s)", flush=True)
    return ms


_ORIG_GN = L.group_norm
_ORIG_BACKENDS = dict(L._ATTN_BACKENDS)
_ORIG_DPA = jax.nn.dot_product_attention


def set_identity_gn(on: bool):
    fn = (lambda c, eps, dtype, name: (lambda x: x)) if on else _ORIG_GN
    L.group_norm = fn
    U.group_norm = fn
    if hasattr(V, "group_norm"):
        V.group_norm = fn


def set_identity_attn(on: bool):
    if on:
        L._ATTN_BACKENDS["xla"] = lambda q, k, v: q
        L._ATTN_BACKENDS["pallas"] = lambda q, k, v: q
        jax.nn.dot_product_attention = lambda q, k, v, **kw: q
    else:
        L._ATTN_BACKENDS.update(_ORIG_BACKENDS)
        jax.nn.dot_product_attention = _ORIG_DPA


def build_step(backend="xla"):
    cfg = UNetConfig.sd21()
    lat = jnp.zeros((1, 64, 64, 4), DT)
    t = jnp.full((1,), 500.0, jnp.float32)
    embeds = jax.random.normal(jax.random.key(4), (1, 77, 1024), DT)
    cond = jax.random.normal(jax.random.key(5), (1, 512, 512, 3), DT)
    unet = UNet2DConditionModel(cfg, dtype=DT, backend=backend)
    cn = ControlNetModel(
        cfg, conditioning_scale_channels=(16, 32, 96, 256), dtype=DT,
        backend=backend,
    )
    up = zeros_init(unet, lat, t, embeds)
    cnp = zeros_init(cn, lat, t, embeds, cond)

    @jax.jit
    def step_scan(up, cnp, x):
        def body(c, _):
            down, mid = cn.apply({"params": cnp}, c, t, embeds, cond)
            eps = unet.apply(
                {"params": up}, c, t, embeds,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            )
            return c + 0.1 * eps.astype(c.dtype), ()

        y, _ = jax.lax.scan(body, x, None, length=10)
        return y

    x0 = jax.random.normal(jax.random.key(6), (1, 64, 64, 4), DT)
    return step_scan, (up, cnp, x0)


def build_vae():
    vae = AutoencoderKL(VAEConfig.sd(), dtype=DT)
    vp = zeros_init(vae, jnp.zeros((1, 64, 64, 3), DT), jax.random.key(0))

    @jax.jit
    def vae_scan(vp, lat):
        def body(c, _):
            img = vae.apply({"params": vp}, c, method=vae.decode)
            return c + jnp.mean(img).astype(c.dtype) * 0.01, ()

        y, _ = jax.lax.scan(body, lat, None, length=5)
        return y

    lat = jax.random.normal(jax.random.key(7), (1, 64, 64, 4), DT)
    return vae_scan, (vp, lat)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    r = {}

    r["step baseline"] = 20.213  # measured (first run)
    r["step pallas_self"] = 21.246  # measured (first run)

    set_identity_attn(True)
    fn, args = build_step("xla")
    r["step no-attn"] = timeit("cn+unet step [attention=identity]", fn, args, 10)
    set_identity_attn(False)

    set_identity_gn(True)
    fn, args = build_step("xla")
    r["step no-gn"] = timeit("cn+unet step [groupnorm=identity]", fn, args, 10)
    set_identity_gn(False)

    set_identity_gn(True)
    set_identity_attn(True)
    fn, args = build_step("xla")
    r["step no-gn no-attn"] = timeit(
        "cn+unet step [no gn, no attn]", fn, args, 10
    )
    set_identity_attn(False)
    set_identity_gn(False)

    fn, args = build_vae()
    r["vae baseline"] = timeit("vae decode [baseline]", fn, args, 5)

    set_identity_gn(True)
    fn, args = build_vae()
    r["vae no-gn"] = timeit("vae decode [groupnorm=identity]", fn, args, 5)
    set_identity_gn(False)

    set_identity_attn(True)
    fn, args = build_vae()
    r["vae no-attn"] = timeit("vae decode [attention=identity]", fn, args, 5)
    set_identity_attn(False)

    print("\n== win upper bounds (ms per denoise step / per decode) ==")
    print(f"attention in step : {r['step baseline'] - r['step no-attn']:.2f}")
    print(f"groupnorm in step : {r['step baseline'] - r['step no-gn']:.2f}")
    print(f"pallas_self delta : {r['step baseline'] - r['step pallas_self']:.2f}")
    print(f"gn in vae decode  : {r['vae baseline'] - r['vae no-gn']:.2f}")
    print(f"attn in vae decode: {r['vae baseline'] - r['vae no-attn']:.2f}")
    tot5 = 5 * r["step baseline"] + r["vae baseline"]
    print(f"5-step+decode device total: {tot5:.1f} ms")


if __name__ == "__main__":
    main()
