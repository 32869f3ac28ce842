"""Jittable image augmentations (NHWC) replacing the reference's
GPU-torchvision pipelines.

Two consumers with the reference's exact recipes:

* ControlNet trainer ``augment_data`` (``diffusion/train_controlnet_genima.py
  :775-830``): colorjitter/elastic/blur on the *conditioning* image only,
  joint affine and joint reflect-pad-2 random crop on both.
* ACT policy train-time augs (``controller/method/genima_act.py:150-163``):
  RandomApply(elastic(80,10)) -> RandomApply(colorjitter) ->
  RandomApply(random-crop pad 4) -> gaussian noise sigma 5.

All functions are pure, take explicit keys, operate on float images, and
vmap/jit cleanly (static shapes; randomness via jax.random).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# color jitter
# ---------------------------------------------------------------------------


def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    rc = (maxc - r) / jnp.maximum(delta, 1e-8)
    gc = (maxc - g) / jnp.maximum(delta, 1e-8)
    bc = (maxc - b) / jnp.maximum(delta, 1e-8)
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def pick(opts):
        # selects (VPU) — jnp.choose lowered to gathers and cost 120 ms on
        # a (32,256,256,3) batch on v5e (PERF.md)
        out = opts[0]
        for idx in range(1, 6):
            out = jnp.where(i == idx, opts[idx], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(
    key: jax.Array,
    images: jax.Array,  # (..., H, W, 3) in [0, 1]
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.1,
    hue: float = 0.05,
) -> jax.Array:
    """torchvision ColorJitter semantics (uniform factors, one draw per call)."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    h = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    x = images * b
    mean = jnp.mean(x, axis=(-1, -2, -3), keepdims=True)
    x = (x - mean) * c + mean
    x = jnp.clip(x, 0.0, 1.0)
    hsv = _rgb_to_hsv(x)
    hsv = hsv.at[..., 1].multiply(s)
    hsv = hsv.at[..., 0].add(h)
    hsv = hsv.at[..., 0].set(hsv[..., 0] % 1.0)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1], 0.0, 1.0))
    return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)


# ---------------------------------------------------------------------------
# gaussian blur / smoothing
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(sigma: jax.Array, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C)
    kernel_size: int = 3,
    sigma_range: tuple[float, float] = (0.1, 2.0),
) -> jax.Array:
    """Separable gaussian blur with a random sigma (torchvision GaussianBlur)."""
    sigma = jax.random.uniform(
        key, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    radius = kernel_size // 2
    k = _gaussian_kernel1d(sigma, radius)
    return _separable_filter(images, k)


def _separable_filter(images: jax.Array, k: jax.Array) -> jax.Array:
    b, h, w, c = images.shape
    radius = (k.shape[0] - 1) // 2
    x = jnp.moveaxis(images, -1, 1).reshape(b * c, 1, h, w)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    pad_h = [(0, 0), (0, 0), (radius, radius), (0, 0)]
    pad_w = [(0, 0), (0, 0), (0, 0), (radius, radius)]
    x = jnp.pad(x, pad_h, mode="reflect")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jnp.pad(x, pad_w, mode="reflect")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return jnp.moveaxis(x.reshape(b, c, h, w), 1, -1)


# ---------------------------------------------------------------------------
# bilinear warping
# ---------------------------------------------------------------------------


def bilinear_sample(
    images: jax.Array,  # (B, H, W, C)
    src_y: jax.Array,  # (H, W) float source coordinates
    src_x: jax.Array,
    cval: float | None = None,
) -> jax.Array:
    """Bilinear resampling with one shared coordinate grid.

    Gathers (B, C) vectors per corner (4 gathers total) instead of
    per-pixel-per-channel scalars — jax.scipy.ndimage.map_coordinates
    vmapped over channels made the ACT update 52x slower than the model
    itself on TPU (140.7 -> 2.7 ms/step at batch 8, PERF.md).

    ``cval=None`` clamps to the edge (mode="nearest"); a float gives
    constant fill outside the image (mode="constant").
    """
    b, h, w, c = images.shape
    if cval is None:
        # edge clamp must happen BEFORE floor/weights: otherwise coords in
        # (-1, 0) interpolate between rows 0 and 1 with weight up to ~1 on
        # row 1 instead of clamping to row 0 (mode="nearest" semantics)
        src_y = jnp.clip(src_y, 0.0, h - 1)
        src_x = jnp.clip(src_x, 0.0, w - 1)
    y0f = jnp.floor(src_y)
    x0f = jnp.floor(src_x)
    wy = (src_y - y0f)[None, :, :, None]
    wx = (src_x - x0f)[None, :, :, None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)

    def g(yi, xi):
        # adjacent advanced indices keep their position: (B, H, W, C)
        return images[:, yi, xi, :]

    out = (
        (1 - wy) * (1 - wx) * g(y0, x0)
        + (1 - wy) * wx * g(y0, x1)
        + wy * (1 - wx) * g(y1, x0)
        + wy * wx * g(y1, x1)
    )
    if cval is not None:
        inside = (
            (src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1)
        )[None, :, :, None]
        out = jnp.where(inside, out, cval)
    return out.astype(images.dtype)


# ---------------------------------------------------------------------------
# elastic transform
# ---------------------------------------------------------------------------


def elastic_transform(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C)
    alpha: float = 80.0,
    sigma: float = 10.0,
) -> jax.Array:
    """torchvision ElasticTransform: smoothed random displacement field.

    One displacement field per call (torchvision draws one per image batch).
    """
    b, h, w, c = images.shape
    kx, ky = jax.random.split(key)
    # torchvision: uniform noise in [-1, 1], gaussian-smoothed, scaled alpha/size
    dx = jax.random.uniform(kx, (1, h, w, 1), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(ky, (1, h, w, 1), minval=-1.0, maxval=1.0)
    radius = int(2 * sigma) | 1
    k = _gaussian_kernel1d(jnp.float32(sigma), radius)
    dx = _separable_filter(dx, k)[0, ..., 0] * (alpha / w)
    dy = _separable_filter(dy, k)[0, ..., 0] * (alpha / h)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # displacements are in normalized grid units in torchvision; here pixels
    src_y = yy + dy * h / 2.0
    src_x = xx + dx * w / 2.0

    return bilinear_sample(images, src_y, src_x)


# ---------------------------------------------------------------------------
# affine + crops
# ---------------------------------------------------------------------------


def random_affine(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C)
    degrees: tuple[float, float] = (0.0, 10.0),
    translate: tuple[float, float] = (0.1, 0.1),
    scale_range: tuple[float, float] = (0.9, 1.1),
) -> jax.Array:
    """Shared-parameter random affine (reference applies the SAME transform to
    image and conditioning image, ``train_controlnet_genima.py:793-806``).
    Returns transformed images; draw params once per batch."""
    b, h, w, c = images.shape
    ka, kt, ks = jax.random.split(key, 3)
    angle = jnp.deg2rad(
        jax.random.uniform(ka, (), minval=degrees[0], maxval=degrees[1])
    )
    tx = jax.random.uniform(kt, (), minval=-translate[0], maxval=translate[0]) * w
    ty = jax.random.uniform(kt, (), minval=-translate[1], maxval=translate[1]) * h
    sc = jax.random.uniform(ks, (), minval=scale_range[0], maxval=scale_range[1])

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(angle) / sc, jnp.sin(angle) / sc
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # inverse mapping: output pixel -> source pixel
    x0 = xx - cx - tx
    y0 = yy - cy - ty
    src_x = cos * x0 + sin * y0 + cx
    src_y = -sin * x0 + cos * y0 + cy

    return bilinear_sample(images, src_y, src_x, cval=0.0)


def random_crop_with_pad(
    key: jax.Array,
    images: jax.Array,  # (B, H, W, C)
    padding: int,
    mode: str = "reflect",
) -> jax.Array:
    """Reflect-pad then crop back to the original size at a random offset —
    one offset per call (the reference crops image+conditioning jointly)."""
    b, h, w, c = images.shape
    padded = jnp.pad(
        images, [(0, 0), (padding, padding), (padding, padding), (0, 0)], mode=mode
    )
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (), 0, 2 * padding + 1)
    ox = jax.random.randint(kx, (), 0, 2 * padding + 1)
    return jax.lax.dynamic_slice(padded, (0, oy, ox, 0), (b, h, w, c))


def add_gaussian_noise(
    key: jax.Array, images: jax.Array, std: float = 5.0, mean: float = 0.0
) -> jax.Array:
    """AddGaussianNoise (reference ``controller/utils/misc.py:50-65``) —
    std in the same units as the image (5.0 on [0,255] pixels)."""
    return images + jax.random.normal(key, images.shape) * std + mean


def random_apply(key: jax.Array, fn, images: jax.Array, p: float = 0.5) -> jax.Array:
    """torchvision RandomApply under jit: lax.cond on a bernoulli draw."""
    kp, kf = jax.random.split(key)
    apply = jax.random.bernoulli(kp, p)
    return jax.lax.cond(apply, lambda x: fn(kf, x), lambda x: x, images)


# ---------------------------------------------------------------------------
# composite recipes
# ---------------------------------------------------------------------------


def controlnet_train_augment(
    key: jax.Array,
    pixel_values: jax.Array,  # (B,H,W,3) in [-1,1] (target image)
    conditioning: jax.Array,  # (B,H,W,3) in [0,1]
    augmentations: str = "colorjitter,crop",
) -> tuple[jax.Array, jax.Array]:
    """The reference's augment_data recipe. ``augmentations`` is the same
    comma-separated flag string (default matches the reference CLI default)."""
    augs = [a for a in augmentations.split(",") if a]
    k = jax.random.split(key, 6)
    if "colorjitter" in augs:
        conditioning = color_jitter(k[0], conditioning)
    if "elastic" in augs:
        conditioning = elastic_transform(k[1], conditioning)
    if "blur" in augs:
        conditioning = gaussian_blur(k[2], conditioning)
    if "affine" in augs:
        # same params for both: re-use the same key
        pixel_values = random_affine(k[3], pixel_values)
        conditioning = random_affine(k[3], conditioning)
    if "crop" in augs:
        both = jnp.concatenate([pixel_values, conditioning], axis=-1)
        both = random_crop_with_pad(k[4], both, padding=2, mode="reflect")
        pixel_values, conditioning = jnp.split(both, 2, axis=-1)
    return pixel_values, conditioning


def act_train_augment(key: jax.Array, images: jax.Array) -> jax.Array:
    """The GenimaACTPolicy train-time recipe on [0,255] float images
    (reference ``genima_act.py:150-163``)."""
    k = jax.random.split(key, 4)
    x = images / 255.0
    x = random_apply(k[0], partial(elastic_transform, alpha=80.0, sigma=10.0), x)
    x = random_apply(k[1], color_jitter, x)
    x = x * 255.0
    x = random_apply(
        k[2], partial(random_crop_with_pad, padding=4, mode="constant"), x
    )
    x = add_gaussian_noise(k[3], x, std=5.0)
    return x
