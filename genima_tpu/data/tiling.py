"""2x2 camera tiling/untiling as pure XLA ops.

The reference packs 4 x 256x256 camera views into one 512x512 canvas so a
*single* SD forward pass draws targets for all cameras with free cross-view
consistency (reference ``controller/utils/misc.py:6-47``). Quadrant order is
camera order: cameras[0] top-left, cameras[1] top-right, cameras[2]
bottom-left, cameras[3] bottom-right (``misc.py:13-16``; at eval the order is
[wrist, front, right_shoulder, left_shoulder], ``eval_genima.py:231-234``).

Here tiling is a reshape/transpose — no PIL, no host round-trip — so it can
live inside the jitted closed-loop step. Layout is NHWC (TPU-native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tile_images(views: jax.Array) -> jax.Array:
    """(..., 4, H, W, C) -> (..., 2H, 2W, C), quadrants [TL, TR, BL, BR].

    Works under jit/vmap for any leading batch dims.
    """
    *lead, four, h, w, c = views.shape
    assert four == 4, f"tile_images expects 4 views, got {four}"
    grid = views.reshape(*lead, 2, 2, h, w, c)
    # (..., gy, gx, h, w, c) -> (..., gy, h, gx, w, c) -> (..., 2h, 2w, c)
    perm = list(range(len(lead))) + [
        len(lead), len(lead) + 2, len(lead) + 1, len(lead) + 3, len(lead) + 4,
    ]
    return grid.transpose(perm).reshape(*lead, 2 * h, 2 * w, c)


def untile_images(tiled: jax.Array) -> jax.Array:
    """(..., 2H, 2W, C) -> (..., 4, H, W, C), inverse of :func:`tile_images`."""
    *lead, hh, ww, c = tiled.shape
    h, w = hh // 2, ww // 2
    grid = tiled.reshape(*lead, 2, h, 2, w, c)
    perm = list(range(len(lead))) + [
        len(lead), len(lead) + 2, len(lead) + 1, len(lead) + 3, len(lead) + 4,
    ]
    return grid.transpose(perm).reshape(*lead, 4, h, w, c)


def resize_half(images: jax.Array) -> jax.Array:
    """Antialiased bilinear 2x downscale on the two trailing spatial axes.

    Matches the reference's ``transforms.Resize(256)`` on the 512x512
    generated tiles before untiling feeds the controller
    (``controller/agent/diffusion_agent.py:44-62``). ``jax.image.resize``
    with ``antialias=True`` applies the same triangle filter family as
    PIL/torchvision bilinear downsampling.
    """
    *lead, h, w, c = images.shape
    out_shape = (*lead, h // 2, w // 2, c)
    return jax.image.resize(images, out_shape, method="linear", antialias=True)


def untile_to_cameras(tiled: jax.Array, target_size: int = 256) -> jax.Array:
    """Generated 512 tile -> per-camera controller inputs.

    (..., 512, 512, C) -> (..., 4, 256, 256, C). The reference crops 256
    quadrants and applies ``transform_to_half_resolution`` (512->256 resize,
    a no-op on the already-256 crops at the default eval resolution;
    ``controller/utils/misc.py:22-47``). Quadrants are resized only when the
    tile size differs from 2*target_size.
    """
    views = untile_images(tiled)
    *lead, four, h, w, c = views.shape
    if h != target_size:
        views = jax.image.resize(
            views,
            (*lead, four, target_size, target_size, c),
            method="linear",
            antialias=h > target_size,
        )
    return views


def normalize_to_unit(images: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [-1,1] (SD VAE input convention)."""
    return images.astype(jnp.float32) / 127.5 - 1.0


def denormalize_to_uint8(images: jax.Array) -> jax.Array:
    """[-1,1] -> uint8, matching diffusers' VaeImageProcessor.postprocess."""
    x = jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)
    return jnp.round(x * 255.0).astype(jnp.uint8)
