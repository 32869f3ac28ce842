import jax.numpy as jnp
import numpy as np

from genima_tpu.data import tiling
import pytest

pytestmark = pytest.mark.fast


def test_tile_untile_roundtrip():
    views = np.random.randint(0, 255, (4, 256, 256, 3)).astype(np.float32)
    tiled = tiling.tile_images(jnp.asarray(views))
    assert tiled.shape == (512, 512, 3)
    back = tiling.untile_images(tiled)
    np.testing.assert_array_equal(np.asarray(back), views)


def test_tile_quadrant_order_matches_reference():
    # reference misc.py:13-16 pastes image k at positions
    # [(0,0), (256,0), (0,256), (256,256)] in (x, y) coords: TL, TR, BL, BR
    views = np.zeros((4, 256, 256, 3), np.float32)
    for k in range(4):
        views[k] = k + 1
    tiled = np.asarray(tiling.tile_images(jnp.asarray(views)))
    assert tiled[0, 0, 0] == 1  # TL = cam 0
    assert tiled[0, 511, 0] == 2  # TR = cam 1
    assert tiled[511, 0, 0] == 3  # BL = cam 2
    assert tiled[511, 511, 0] == 4  # BR = cam 3


def test_tile_batched():
    views = np.random.rand(5, 4, 8, 8, 3).astype(np.float32)
    tiled = tiling.tile_images(jnp.asarray(views))
    assert tiled.shape == (5, 16, 16, 3)
    back = np.asarray(tiling.untile_images(tiled))
    np.testing.assert_array_equal(back, views)


def test_resize_half_box_average():
    # constant image stays constant under any interpolation
    img = np.full((1, 512, 512, 3), 7.0, np.float32)
    small = np.asarray(tiling.resize_half(jnp.asarray(img)))
    assert small.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(small, 7.0, rtol=1e-5)


def test_untile_to_cameras():
    tiled = np.random.rand(2, 512, 512, 3).astype(np.float32)
    cams = tiling.untile_to_cameras(jnp.asarray(tiled))
    assert cams.shape == (2, 4, 256, 256, 3)


def test_normalize_roundtrip():
    img = np.random.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    x = tiling.normalize_to_unit(jnp.asarray(img))
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    back = np.asarray(tiling.denormalize_to_uint8(x))
    np.testing.assert_array_equal(back, img)
