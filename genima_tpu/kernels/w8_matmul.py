"""Weight-only int8 matmul: dequantize-in-kernel Pallas GEMM.

Serving-time weight compression for the diffusion transformer blocks
(PERF.md lever 7). The batch-1 UNet's fat 1280-channel blocks are
weight-HBM-bound: every denoise step re-reads every matmul weight. Storing
those weights int8 (+ one f32 scale per output channel) halves the weight
traffic vs bf16 and quarters it vs f32 — IF the dequantize happens inside
the kernel. A plain XLA ``x @ w_q.astype(bf16) * s`` materializes the
dequantized matrix to HBM first (the convert is a separate fusion from the
dot), paying the full bf16 traffic anyway; here the int8 tile is DMA'd to
VMEM and converted in registers on its way into the MXU.

Math: per-output-channel symmetric quantization. ``w ~= w_q * s[None, :]``
with ``w_q`` int8 and ``s = max|w|/127`` per column, so

    x @ w  ~=  (x @ w_q) * s[None, :]

— the scale factors out of the contraction and is applied once to the
(M, N) accumulator, NOT per weight element: dequantization costs one
int8->bf16 convert per weight tile plus one f32 multiply per output.

Quantizes ONLY 2-D matmul weights (attention q/k/v/out, GEGLU/FF, the
transformers' linear proj_in/proj_out). Convs keep full precision: they
carry the spatial inductive bias and XLA's conv fusions.

MEASURED OUTCOME (scripts/ab_w8.py, v5e, 5-step SD generate, slope-timed):
"fused" 80.9 ms/gen vs "fused+w8" 133.8 — weight-only int8 is a MEMORY
knob on v5e (4x smaller transformer weights vs f32; SDXL's 16 GB f32 tree
doesn't fit one chip at all), NOT a latency knob: at batch 1 the ~3 ms/gen
of recoverable weight traffic (PERF.md lever 7) is dwarfed by the
custom-call boundaries this kernel inserts into XLA's transformer-block
fusions, and layers with N % 128 != 0 (the whole 320-channel level) take
the XLA dequant fallback, which materializes bf16 weight copies per step.
Same verdict shape as blockwise 8-bit Adam (core/optim.py).

Replaces (with the quantization error measured, see tests/test_w8.py):
nothing in the reference — the reference serves f16 torch; this is the
TPU-native serving-compression knob the reference gets from bitsandbytes
only for the *optimizer*.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: kernel (K, N) -> (w_q int8 (K, N),
    scale f32 (N,)). ``kernel ~= w_q * scale[None, :]``."""
    k32 = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k32), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(k32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_q, scale


def _kernel(x_ref, w_ref, s_ref, o_ref):
    # int8 tile -> bf16 in VMEM/registers; MXU contraction in bf16 with f32
    # accumulation; the per-column scale applied once on the accumulator.
    acc = jnp.dot(
        x_ref[:].astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def _pick_bm(m: int) -> int:
    for bm in (256, 128, 64, 32, 16, 8):
        if m % bm == 0:
            return bm
    return 0


def _applicable(m: int, k: int, n: int) -> bool:
    if _pick_bm(m) == 0 or n % 128 != 0:
        return False
    # single-K-step design: the (bm, K) x-block + (K, bn) w-block must fit
    # VMEM with double buffering. K up to ~5120 at bm,bn=256 is ~4 MB.
    return k <= 8192


def _w8_matmul_2d(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    m, k = x.shape
    _, n = w_q.shape
    bm = _pick_bm(m)
    bn = 256 if n % 256 == 0 else 128
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 2,
            transcendentals=0,
        ),
    )(x, w_q, scale.reshape(1, n).astype(jnp.float32))


def w8_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """``x @ dequant(w_q, scale)`` with in-kernel dequantization.

    x: (..., K) float; w_q: (K, N) int8; scale: (N,) f32.
    Returns (..., N) in x.dtype. Falls back to an XLA dequant-matmul for
    shapes outside the kernel's tiling (tiny test configs, ragged M).
    """
    k, n = w_q.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    if _applicable(m, k, n) and jax.default_backend() == "tpu":
        out = _w8_matmul_2d(x2, w_q, scale)
    else:
        out = (
            jnp.dot(
                x2.astype(jnp.bfloat16),
                w_q.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            * scale[None, :]
        ).astype(x.dtype)
    return out.reshape(*lead, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8_matmul_interpret(x, w_q, scale, interpret=True):
    """Interpreter-mode entry for CPU parity tests of the kernel body."""
    m, k = x.shape
    _, n = w_q.shape
    bm, bn = _pick_bm(m), 256 if n % 256 == 0 else 128
    return pl.pallas_call(
        _kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n).astype(jnp.float32))
