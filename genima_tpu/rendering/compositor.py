"""Compositing rendered spheres onto backgrounds (XLA ops).

The reference composites on host numpy (``render/render_data.py:282-311``):

* *rgb_rendered* (full context): white render pixels <- original RGB,
* *rnd_bg* (random context): white <- a random texture image; sphere pixels
  alpha-blended with the texture, blend ~ U(alpha_blend, 1.0).

Here the renderer returns an exact hit mask, so compositing is a masked
select/lerp — no fragile white-pixel detection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def composite_rgb_rendered(
    render: jax.Array,  # (H, W, 3) [0,1], white bg
    hit_mask: jax.Array,  # (H, W) bool
    rgb: jax.Array,  # (H, W, 3) [0,1] original observation
) -> jax.Array:
    return jnp.where(hit_mask[..., None], render, rgb)


def composite_rnd_bg(
    render: jax.Array,
    hit_mask: jax.Array,
    texture: jax.Array,  # (H, W, 3) [0,1] random background texture
    blend: jax.Array,  # scalar in [alpha_blend, 1]
) -> jax.Array:
    blended = render * blend + texture * (1.0 - blend)
    return jnp.where(hit_mask[..., None], blended, texture)
