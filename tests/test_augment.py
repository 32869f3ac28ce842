import jax
import jax.numpy as jnp
import numpy as np

from genima_tpu.data import augment
import pytest

pytestmark = pytest.mark.fast


def _img(b=2, h=16, w=16):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))


def test_color_jitter_bounds_and_determinism():
    x = _img()
    out = augment.color_jitter(jax.random.key(0), x)
    assert out.shape == x.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    out2 = augment.color_jitter(jax.random.key(0), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment.color_jitter(jax.random.key(1), x)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-6


def test_hsv_roundtrip():
    x = _img(1)
    hsv = augment._rgb_to_hsv(x)
    back = augment._hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_gaussian_blur_preserves_mean():
    x = _img()
    out = augment.gaussian_blur(jax.random.key(0), x)
    np.testing.assert_allclose(
        float(out.mean()), float(x.mean()), rtol=0.02
    )


def test_elastic_transform_shape_and_identity_at_zero_alpha():
    x = _img()
    out = augment.elastic_transform(jax.random.key(0), x, alpha=0.0, sigma=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    out2 = augment.elastic_transform(jax.random.key(0), x, alpha=50.0)
    assert np.abs(np.asarray(out2) - np.asarray(x)).max() > 1e-3


def test_random_crop_with_pad_shape():
    x = _img()
    out = augment.random_crop_with_pad(jax.random.key(0), x, padding=2)
    assert out.shape == x.shape


def test_random_affine_identity_params():
    x = _img()
    out = augment.random_affine(
        jax.random.key(0), x, degrees=(0.0, 0.0), translate=(0.0, 0.0),
        scale_range=(1.0, 1.0),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_random_apply_branches():
    x = _img()
    hits = 0
    for i in range(20):
        out = augment.random_apply(
            jax.random.key(i), lambda k, im: im + 1.0, x, p=0.5
        )
        hits += int(float(out.mean()) > 1.0)
    assert 3 < hits < 17  # both branches taken


def test_controlnet_recipe_joint_crop():
    """affine/crop must apply the SAME transform to image and conditioning."""
    pixel = _img() * 2 - 1
    cond = _img()
    p2, c2 = augment.controlnet_train_augment(
        jax.random.key(0), pixel, cond, "crop"
    )
    assert p2.shape == pixel.shape and c2.shape == cond.shape
    # identical content pattern: cropping a constant-diff pair keeps the diff
    diff_before = np.asarray(pixel) - (np.asarray(cond) * 2 - 1)
    p3, c3 = augment.controlnet_train_augment(
        jax.random.key(1), jnp.asarray(np.asarray(cond) * 2 - 1), cond, "crop"
    )
    np.testing.assert_allclose(
        np.asarray(p3), np.asarray(c3) * 2 - 1, atol=1e-5
    )
    del diff_before


def test_act_recipe_runs_under_jit():
    x = _img() * 255.0

    @jax.jit
    def run(key, x):
        return augment.act_train_augment(key, x)

    out = run(jax.random.key(0), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_bilinear_sample_edge_clamp_matches_map_coordinates():
    """cval=None must clamp coords BEFORE computing weights (mode="nearest"):
    a source row of -0.9 reads row 0 exactly, not a 0.9-weighted row 1."""
    from jax.scipy.ndimage import map_coordinates

    img = _img(b=1, h=8, w=8)
    yy, xx = jnp.meshgrid(
        jnp.arange(8, dtype=jnp.float32), jnp.arange(8, dtype=jnp.float32),
        indexing="ij",
    )
    src_y = yy - 0.9  # first row samples from -0.9 (outside)
    src_x = xx + 0.7  # last col samples from 7.7 (outside)
    got = augment.bilinear_sample(img, src_y, src_x, cval=None)
    want = jnp.stack(
        [
            map_coordinates(img[0, :, :, c], [src_y, src_x], order=1, mode="nearest")
            for c in range(3)
        ],
        axis=-1,
    )[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
