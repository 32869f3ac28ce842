"""Fused GroupNorm-SiLU-Conv3x3 Pallas kernel for the VAE decoder tail.

Replaces the XLA [groupnorm -> silu -> conv2d(3x3) -> (+skip/residual)]
chain of ``nn/layers.py::ResnetBlock2D`` on the shapes where slope-based
profiling (scripts/profile_vae.py, PERF.md round-2 continuation) showed XLA
running at 34-46% MXU: the narrow-channel 512^2/256^2 stages of the SD VAE
decoder (reference: diffusers AutoencoderKL.decode, frozen in
``diffusion/train_controlnet_genima.py:1324-1332``; ~17.8 ms of the 90 ms
generation budget).

Design (v5e):

* **GN stats stay in XLA** (a global (B, groups) reduction fuses with the
  producer); the kernel takes the folded per-channel ``scale``/``shift``
  and applies normalize+SiLU in VMEM — the normalized activation is never
  materialized in HBM (XLA must materialize it because convs can't consume
  fusions).
* **Flat-offset taps**: the band is stored (rows, LPAD+W+pad, C) with 8
  zero columns on the left (the DMA destination offset must be
  sublane-aligned) and ``stride`` a multiple of the sublane tile; the
  3x3 conv is 9 MXU matmuls on slices of the (rows*stride, C) flattening
  at static offsets ``di*stride+dj`` accumulated in an f32 VMEM buffer
  read back at column base 7 — no shifted copies of the activation are
  materialized, and edge wrap lands only in the discarded pad columns.
* **Manual halo DMA**: x lives in ANY/HBM; each grid step DMAs its
  (R+2)-row band (boundary bands zero their out-of-range halo row), so no
  padded copy of x is ever written to HBM. Residual and output ride
  ordinary BlockSpecs (auto-pipelined).
* The optional 1x1 ``conv_shortcut`` of channel-changing resnet blocks is
  a 10th matmul on the raw (un-normalized) band.

The backward pass recomputes through the XLA reference (exact; this kernel
is inference-path — the VAE is frozen during ControlNet training).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False
    pltpu = None

_SUBLANE = 16  # bf16 sublane tile
_LPAD = 8  # left zero-pad columns (DMA dst offset must be sublane-aligned)


def _band_kernel(
    # refs (order must match wrapper): scale, shift, w, b, [wskip], [res], x_any, out
    *refs,
    rows: int,
    width: int,
    stride: int,
    n_bands: int,
    has_affine: bool,
    has_skip: bool,
    has_res: bool,
    out_dtype,
    use_dma: bool,
):
    idx = 0
    scale_ref = shift_ref = None
    if has_affine:
        scale_ref, shift_ref = refs[0], refs[1]
        idx = 2
    w_ref, b_ref = refs[idx], refs[idx + 1]
    idx += 2
    wskip_ref = None
    if has_skip:
        wskip_ref = refs[idx]
        idx += 1
    res_ref = None
    if has_res:
        res_ref = refs[idx]
        idx += 1
    x_any, out_ref = refs[idx], refs[idx + 1]
    if use_dma:
        xt, acc_ref, sem = refs[idx + 2], refs[idx + 3], refs[idx + 4]
    else:
        xt, acc_ref = refs[idx + 2], refs[idx + 3]

    bi = pl.program_id(0)
    i = pl.program_id(1)
    c = xt.shape[-1]
    h_img = n_bands * rows

    # ---- halo DMA: image rows [i*rows - 1, i*rows + rows + 1) -> xt ----
    # xt row k = image row i*rows + k - 1; image col m at xt col m + LPAD.
    if not use_dma:
        # test/CPU variant: the whole image arrives as one VMEM block
        # (n_bands == 1); identical tap math, no DMA semaphores (the
        # generic interpreter deadlocks intermittently on them).
        assert n_bands == 1, "whole-image variant requires a single band"
        xt[0:1] = jnp.zeros_like(xt[0:1])
        xt[rows + 1 :] = jnp.zeros_like(xt[rows + 1 :])
        xt[pl.ds(1, rows), pl.ds(_LPAD, width)] = x_any[0]
    elif n_bands == 1:
        xt[0:1] = jnp.zeros_like(xt[0:1])
        xt[rows + 1 :] = jnp.zeros_like(xt[rows + 1 :])
        dma = pltpu.make_async_copy(
            x_any.at[bi, :, :, :],
            xt.at[pl.ds(1, rows), pl.ds(_LPAD, width)],
            sem,
        )
        dma.start()
        dma.wait()
    else:

        @pl.when(jnp.logical_and(i > 0, i < n_bands - 1))
        def _interior():
            dma = pltpu.make_async_copy(
                x_any.at[bi, pl.ds(i * rows - 1, rows + 2), :, :],
                xt.at[pl.ds(0, rows + 2), pl.ds(_LPAD, width)],
                sem,
            )
            dma.start()
            dma.wait()

        @pl.when(i == 0)
        def _first():
            xt[0:1] = jnp.zeros_like(xt[0:1])
            dma = pltpu.make_async_copy(
                x_any.at[bi, pl.ds(0, rows + 1), :, :],
                xt.at[pl.ds(1, rows + 1), pl.ds(_LPAD, width)],
                sem,
            )
            dma.start()
            dma.wait()

        @pl.when(i == n_bands - 1)
        def _last():
            xt[rows + 1 : rows + 2] = jnp.zeros_like(xt[rows + 1 : rows + 2])
            dma = pltpu.make_async_copy(
                x_any.at[bi, pl.ds(h_img - rows - 1, rows + 1), :, :],
                xt.at[pl.ds(0, rows + 1), pl.ds(_LPAD, width)],
                sem,
            )
            dma.start()
            dma.wait()

    # zero the pad columns (DMA wrote only cols [LPAD, LPAD+width))
    xt[:, 0:_LPAD] = jnp.zeros_like(xt[:, 0:_LPAD])
    xt[:, width + _LPAD :] = jnp.zeros_like(xt[:, width + _LPAD :])

    n_flat = rows * stride
    o = out_ref.shape[-1]

    # ---- optional 1x1 shortcut on the RAW band (center rows) ----
    # NOTE: xt has rows+3 rows; the extra last row is never written by the
    # DMA and only feeds tap positions whose outputs land in the discarded
    # pad columns, so its (arbitrary) contents never reach real outputs.
    # out[r, w] = acc[r*stride + w + LPAD-1]: tap (di, dj) then reads flat
    # index (r+di)*stride + (w+dj-1) + LPAD = xt[r+di, w+dj+LPAD-1] —
    # exactly h[r+di-1, w+dj-1] in image coordinates (xt is offset +1 in
    # rows, +LPAD in columns). The 1x1 skip at (r, w) reads raw
    # xt[r+1, w+LPAD] -> flat offset stride+1 relative to the same base.
    if has_skip:
        raw_flat = xt[...].reshape((rows + 3) * stride, c)
        acc_ref[...] = jax.lax.dot_general(
            jax.lax.slice_in_dim(
                raw_flat, stride + 1, stride + 1 + n_flat, axis=0
            ),
            wskip_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[...] = jnp.zeros((n_flat, o), jnp.float32)

    # ---- normalize + SiLU in place; re-zero conv padding afterwards ----
    if has_affine:
        hb = xt[...] * scale_ref[...][None] + shift_ref[...][None]
        hb = (hb * jax.nn.sigmoid(hb)).astype(xt.dtype)
        xt[...] = hb
        xt[:, 0:_LPAD] = jnp.zeros_like(xt[:, 0:_LPAD])
        xt[:, width + _LPAD :] = jnp.zeros_like(xt[:, width + _LPAD :])
        if n_bands == 1:
            xt[0:1] = jnp.zeros_like(xt[0:1])
            xt[rows + 1 :] = jnp.zeros_like(xt[rows + 1 :])
        else:

            @pl.when(i == 0)
            def _z0():
                xt[0:1] = jnp.zeros_like(xt[0:1])

            @pl.when(i == n_bands - 1)
            def _zl():
                xt[rows + 1 : rows + 2] = jnp.zeros_like(
                    xt[rows + 1 : rows + 2]
                )

    # ---- 9 taps as flat-offset matmuls, accumulated in VMEM scratch ----
    h_flat = xt[...].reshape((rows + 3) * stride, c)
    for di in range(3):
        for dj in range(3):
            off = di * stride + dj
            tap = jax.lax.slice_in_dim(h_flat, off, off + n_flat, axis=0)
            acc_ref[...] += jax.lax.dot_general(
                tap,
                w_ref[di * 3 + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    acc = acc_ref[...] + b_ref[...].astype(jnp.float32)  # (1, O) broadcasts
    y = acc.reshape(rows, stride, o)[:, _LPAD - 1 : width + _LPAD - 1, :]
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_dtype)


def _pick_rows(h, w, c, o, stride, has_res) -> Optional[int]:
    """Largest power-of-two band height whose VMEM footprint fits the 16 MB
    scoped limit with headroom for Mosaic stack temporaries (the largest is
    one (n_flat, O) f32 dot result plus the activation temp). None = no
    band height fits (very wide channel pairs) -> caller falls back to XLA."""
    # calibrated against compiler-reported scoped allocations: usage ~=
    # xt + acc + w + double-buffered IO blocks + stack temporaries (one
    # acc-sized dot result and one xt-sized activation temp)
    budget = 14 * 2 ** 20
    o_eff = max(o, 128)  # lane padding
    rows = min(h, 64)
    while rows >= 4:
        xt_b = (rows + 3) * stride * c * 2
        acc_b = rows * stride * o_eff * 4
        w_b = 10 * c * o_eff * 2
        io_b = (4 if has_res else 2) * rows * w * o_eff * 2
        temp_b = acc_b + xt_b
        if xt_b + acc_b + w_b + io_b + temp_b <= budget and h % rows == 0:
            return rows
        rows //= 2
    return None


def _xla_reference(x, w, b, scale, shift, wskip, residual):
    h = x
    if scale is not None:
        h = x.astype(jnp.float32) * scale[:, None, None, :] + shift[
            :, None, None, :
        ]
        h = (h * jax.nn.sigmoid(h)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b[None, None, None, :]
    if wskip is not None:
        y = y + jnp.einsum("bhwc,co->bhwo", x, wskip)
    if residual is not None:
        y = y + residual
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_conv3x3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
    wskip: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = conv3x3(silu(x*scale + shift)) + b [+ x@wskip] [+ residual].

    x (B,H,W,C) NHWC; w (3,3,C,O) HWIO; b (O,); scale/shift (B,C) —
    per-batch folded GroupNorm affine (None = plain conv, no activation);
    wskip (C,O) un-normalized 1x1 shortcut; residual (B,H,W,O).
    """
    if interpret is None:
        on_tpu = jax.default_backend() == "tpu" and _HAS_PLTPU
        if not on_tpu or x.shape[-1] % 128 != 0 or w.shape[-1] < 128:
            # off-TPU the interpreter would be pointlessly slow (tests opt
            # in with interpret=True); the halo DMA requires a lane-aligned
            # channel dim; and narrow outputs (conv_out's O=3) blow the
            # VMEM budget on lane padding — all take the XLA chain
            return _xla_reference(x, w, b, scale, shift, wskip, residual)
        interpret = False
    return _forward(x, w, b, scale, shift, wskip, residual, interpret)


def _forward(x, w, b, scale, shift, wskip, residual, interpret):
    bsz, h, wd, c = x.shape
    o = w.shape[-1]
    # stride: LPAD zero cols left + W + >=1 zero col right, multiple of the
    # sublane tile
    stride = -(-(wd + _LPAD + 1) // _SUBLANE) * _SUBLANE
    # interpret (CPU/test) path: whole-image single band via BlockSpec —
    # the generic interpreter intermittently deadlocks on manual DMA
    # semaphores, and the TPU-semantics emulator is orders of magnitude
    # slower. Tap/pad/affine math is shared with the DMA path.
    use_dma = not interpret
    rows = (
        _pick_rows(h, wd, c, o, stride, residual is not None)
        if use_dma
        else h
    )
    if rows is None:
        # band doesn't fit VMEM at full width: split the output channels
        # (each half re-reads x — cheap next to the MXU win on the fat
        # 512->512 shapes) before giving up to XLA
        if o >= 256 and o % 2 == 0:
            half = o // 2
            parts = [
                _forward(
                    x, w[..., :half], b[:half], scale, shift,
                    None if wskip is None else wskip[:, :half],
                    None if residual is None else residual[..., :half],
                    interpret,
                ),
                _forward(
                    x, w[..., half:], b[half:], scale, shift,
                    None if wskip is None else wskip[:, half:],
                    None if residual is None else residual[..., half:],
                    interpret,
                ),
            ]
            return jnp.concatenate(parts, axis=-1)
        return _xla_reference(x, w, b, scale, shift, wskip, residual)
    n_bands = h // rows
    has_affine = scale is not None
    has_skip = wskip is not None
    has_res = residual is not None

    kernel = functools.partial(
        _band_kernel,
        rows=rows,
        width=wd,
        stride=stride,
        n_bands=n_bands,
        has_affine=has_affine,
        has_skip=has_skip,
        has_res=has_res,
        out_dtype=x.dtype,
        use_dma=use_dma,
    )

    operands = []
    in_specs = []
    if has_affine:
        operands += [scale.astype(jnp.float32), shift.astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((1, c), lambda bi, i: (bi, 0)),
            pl.BlockSpec((1, c), lambda bi, i: (bi, 0)),
        ]
    operands += [w.reshape(9, c, o), b.reshape(1, o)]
    in_specs += [
        pl.BlockSpec((9, c, o), lambda bi, i: (0, 0, 0)),
        pl.BlockSpec((1, o), lambda bi, i: (0, 0)),
    ]
    if has_skip:
        operands.append(wskip)
        in_specs.append(pl.BlockSpec((c, o), lambda bi, i: (0, 0)))
    if has_res:
        operands.append(residual)
        in_specs.append(
            pl.BlockSpec((1, rows, wd, o), lambda bi, i: (bi, i, 0, 0))
        )
    operands.append(x)
    if use_dma:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.ANY if _HAS_PLTPU else pl.ANY)
        )
    else:
        in_specs.append(
            pl.BlockSpec((1, h, wd, c), lambda bi, i: (bi, 0, 0, 0))
        )

    flops = bsz * h * wd * o * 2 * (9 * c + (c if has_skip else 0))
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_bands),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows, wd, o), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, o), x.dtype),
        scratch_shapes=(
            [
                pltpu.VMEM((rows + 3, stride, c), x.dtype),
                pltpu.VMEM((rows * stride, o), jnp.float32),
            ]
            + ([pltpu.SemaphoreType.DMA] if use_dma else [])
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                bsz * h * wd * (c + o) * x.dtype.itemsize
                + (bsz * h * wd * o * x.dtype.itemsize if has_res else 0)
            ),
            transcendentals=bsz * h * wd * c if has_affine else 0,
        ),
        interpret=interpret,
    )(*operands)


def _fwd(x, w, b, scale, shift, wskip, residual, interpret):
    y = fused_conv3x3(x, w, b, scale, shift, wskip, residual, interpret)
    return y, (x, w, b, scale, shift, wskip, residual)


def _bwd(interpret, res, g):
    x, w, b, scale, shift, wskip, residual = res
    diff = [x, w, b]
    if scale is not None:
        diff += [scale, shift]
    if wskip is not None:
        diff.append(wskip)
    if residual is not None:
        diff.append(residual)

    def ref(*args):
        it = iter(args)
        xx, ww, bb = next(it), next(it), next(it)
        sc = next(it) if scale is not None else None
        sh = next(it) if scale is not None else None
        sk = next(it) if wskip is not None else None
        rr = next(it) if residual is not None else None
        return _xla_reference(xx, ww, bb, sc, sh, sk, rr)

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(g))
    out = [grads.pop(0), grads.pop(0), grads.pop(0)]
    out.append(grads.pop(0) if scale is not None else None)
    out.append(grads.pop(0) if scale is not None else None)
    out.append(grads.pop(0) if wskip is not None else None)
    out.append(grads.pop(0) if residual is not None else None)
    return tuple(out)


fused_conv3x3.defvjp(_fwd, _bwd)


def fold_group_norm(x, gamma, beta, groups: int, eps: float):
    """Per-batch folded GroupNorm affine: returns (scale, shift), each (B, C),
    such that gn(x) == x * scale[:, None, None] + shift[:, None, None].

    Single pass (E[x^2] - E[x]^2) with f32 accumulation over the source
    dtype — a two-pass jnp.var over an x.astype(f32) copy materializes the
    full activation in f32 (2x HBM traffic per conv, enough to erase the
    kernel's win when chained inside a decoder stage)."""
    bsz, h, w, c = x.shape
    xg = x.reshape(bsz, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
    mean2 = jnp.mean(
        xg.astype(jnp.float32) * xg.astype(jnp.float32), axis=(1, 3),
        dtype=jnp.float32,
    )
    # f32 cancellation can leave E[x^2]-E[x]^2 slightly negative when the
    # mean dominates the std; rsqrt(negative+eps) would emit NaN
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    inv_c = jnp.repeat(inv, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    scale = gamma[None, :] * inv_c
    shift = beta[None, :] - mean_c * scale
    return scale, shift


def gn_silu_conv3x3(
    x, w, b, gamma, beta, groups: int = 32, eps: float = 1e-6,
    wskip=None, skip_bias=None, residual=None, interpret=None,
):
    """Full fused resnet-conv: GroupNorm(groups) -> SiLU -> conv3x3 (+bias)
    with optional un-normalized 1x1 shortcut and residual add — one HBM
    round-trip of the activation instead of XLA's three."""
    scale, shift = fold_group_norm(x, gamma, beta, groups, eps)
    bb = b if skip_bias is None else b + skip_bias
    return fused_conv3x3(x, w, bb, scale, shift, wskip, residual, interpret)
