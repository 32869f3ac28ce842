"""Fast structural parameter initialization.

``flax.Module.init`` builds a threefry key-derivation graph per parameter;
XLA takes tens of seconds to compile it even for tiny models. For the cases
where exact flax init distributions don't matter — tests, benchmarks, and
models that immediately load pretrained/ported weights (the Genima flow:
SD-turbo weights are ported, the ControlNet initializes ``from_unet``) —
``fast_init`` materializes the parameter tree from ``jax.eval_shape``
metadata with host-side numpy draws:

* ``kernel`` / ``embedding`` leaves: fan-in-scaled normal (lecun-like),
* ``scale`` leaves (Layer/GroupNorm): ones,
* ``bias`` and everything else: zeros.

Zero-init conv layers (ControlNet zero convs) stay zero because their names
are ``kernel``/``bias`` — call sites that need exact zeros already are zeros
under this scheme only for bias; kernels get small normals, so ControlNet
tests that rely on exact zero-init must use ``flax_init=True`` or zero the
``controlnet_*`` subtrees explicitly (``zero_subtrees``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def fast_init(
    module,
    rngs_or_key,
    *args,
    seed: int = 0,
    zero_prefixes: tuple[str, ...] = ("controlnet_down_blocks", "controlnet_mid_block"),
    **kwargs,
) -> Any:
    """Shape-faithful random params without compiling an init program."""
    # python scalars/bools/strings must stay static (flags like train=True),
    # so bind them via closure; only array-like kwargs go through eval_shape
    static_kwargs = {
        k: v for k, v in kwargs.items() if isinstance(v, (bool, str)) or v is None
    }
    dyn_kwargs = {k: v for k, v in kwargs.items() if k not in static_kwargs}
    variables_shape = jax.eval_shape(
        lambda *a, **k: module.init(rngs_or_key, *a, **k, **static_kwargs),
        *args,
        **dyn_kwargs,
    )
    rng = np.random.RandomState(seed)

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables_shape)
    leaves = []
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        name = names[-1] if names else ""
        shape, dtype = leaf.shape, leaf.dtype
        in_zero_subtree = any(
            any(str(n).startswith(zp) for zp in zero_prefixes) for n in names
        )
        if in_zero_subtree:
            arr = np.zeros(shape, dtype)
        elif name in ("scale", "var"):
            arr = np.ones(shape, dtype)
        elif name in ("kernel", "embedding") or name.endswith("_embedding"):
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            std = float(1.0 / np.sqrt(max(fan_in, 1)))
            arr = rng.normal(0.0, std, size=shape).astype(dtype)
        else:
            arr = np.zeros(shape, dtype)
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
