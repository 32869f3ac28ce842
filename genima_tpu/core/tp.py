"""Tensor-parallel parameter sharding for the diffusion models (GSPMD).

The reference has no TP/PP (models fit one GPU; SURVEY.md §2.3) — DP is the
parity requirement. This module is the optional scaling headroom for
latency: shard every weight matrix's output features over the mesh's
``fsdp`` axis and let XLA GSPMD propagate the activation shardings and
insert the all-gathers/reduce-scatters over ICI (the scaling-book recipe:
annotate, compile, let the compiler place collectives).

Rules (by leaf shape/name):
* conv kernels (kh, kw, in, out): shard ``out``;
* dense kernels (in, out): shard ``out``;
* biases / norm scales (out,): shard ``out`` where divisible;
* embeddings and everything else: replicated.

Leaves whose sharded axis is not divisible by the axis size stay replicated
(correctness first; GSPMD handles mixed layouts).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genima_tpu.core.mesh import FSDP_AXIS


def tp_param_shardings(params: Any, mesh: Mesh, axis: str = FSDP_AXIS) -> Any:
    """A pytree of NamedShardings mirroring ``params``."""
    size = mesh.shape[axis]

    def rule(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        name = names[-1] if names else ""
        shape = leaf.shape
        if size <= 1 or name == "embedding" or "position_embedding" in name:
            return NamedSharding(mesh, P())
        if name == "kernel" and len(shape) >= 2 and shape[-1] % size == 0:
            spec = [None] * (len(shape) - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        if name in ("bias", "scale") and len(shape) == 1 and shape[0] % size == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [rule(path, leaf) for path, leaf in flat]
    )


def shard_params_tp(params: Any, mesh: Mesh, axis: str = FSDP_AXIS) -> Any:
    """Place params onto the mesh with TP shardings."""
    shardings = tp_param_shardings(params, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
