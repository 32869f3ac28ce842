"""Post-training weight-only int8 for the diffusion transformer blocks.

Converts a full-precision UNet/ControlNet param tree (as loaded from a
checkpoint or ported from torch) into the layout ``nn.layers.W8Dense``
expects: each targeted 2-D matmul ``kernel`` becomes ``kernel_q`` (int8)
+ ``scale`` (f32 per output channel); biases pass through. Applied at
serving time — saved checkpoints stay full precision (the reference has no
analogue: its serving path is f16 torch; see kernels/w8_matmul.py).

Use with ``backend="fused+w8"`` (or any ``<attn>+w8`` spec) on the
pipeline so the modules route these params through the dequantize-in-kernel
Pallas GEMM.
"""

from __future__ import annotations

from typing import Any

from genima_tpu.kernels.w8_matmul import quantize_weight

# Dense layers inside Transformer2DModel subtrees. 'proj' is GEGLU's;
# proj_in/proj_out only exist as 2-D kernels when use_linear_projection
# (conv projections have 4-D kernels and are left untouched).
_TARGET_NAMES = frozenset(
    {"to_q", "to_k", "to_v", "to_out_0", "proj", "net_2", "proj_in",
     "proj_out"}
)


def quantize_dense_tree(params: dict) -> dict:
    """Return a copy of ``params`` (a UNet or ControlNet param tree) with
    every targeted matmul weight quantized to int8 + per-channel scale."""

    def walk(node: Any, name: str) -> Any:
        if not isinstance(node, dict):
            return node
        kernel = node.get("kernel")
        if (
            name in _TARGET_NAMES
            and kernel is not None
            and getattr(kernel, "ndim", 0) == 2
        ):
            w_q, scale = quantize_weight(kernel)
            out = {"kernel_q": w_q, "scale": scale}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        return {k: walk(v, k) for k, v in node.items()}

    return walk(params, "")


def quantize_pipeline_params(params: dict) -> dict:
    """Quantize the UNet (+ ControlNet if present) of a full pipeline tree;
    VAE / text encoders / everything else passes through untouched."""
    out = dict(params)
    for key in ("unet", "controlnet"):
        if key in out:
            out[key] = quantize_dense_tree(out[key])
    return out
