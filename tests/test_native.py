"""Native C++ image-ops extension: correctness vs the PIL path."""

import io

import numpy as np
import pytest
from PIL import Image

from genima_tpu.native import decode_png_batch, get_lib

pytestmark = [
    pytest.mark.fast,
    pytest.mark.skipif(
        get_lib() is None, reason="native extension unavailable (no g++/libpng)"
    ),
]


def _png(arr: np.ndarray) -> bytes:
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="PNG")
    return b.getvalue()


def test_decode_identity_resolution():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    out = decode_png_batch([_png(arr)], 64, mode=0)
    assert out.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(out[0], arr.astype(np.float32) / 255.0, atol=1e-6)


def test_normalize_modes():
    arr = np.full((32, 32, 3), 255, np.uint8)
    out0 = decode_png_batch([_png(arr)], 32, mode=0)
    out1 = decode_png_batch([_png(arr)], 32, mode=1)
    np.testing.assert_allclose(out0, 1.0, atol=1e-6)
    np.testing.assert_allclose(out1, 1.0, atol=1e-6)
    arr0 = np.zeros((32, 32, 3), np.uint8)
    np.testing.assert_allclose(decode_png_batch([_png(arr0)], 32, mode=1), -1.0)


def test_resize_center_crop_matches_pil_closely():
    """Bilinear downscale vs PIL within tolerance (no antialias in the C++
    path; acceptable for the identity-resize standard flow)."""
    rng = np.random.RandomState(1)
    # smooth image so interpolation-filter differences stay small
    base = rng.uniform(0, 255, (8, 8, 3))
    arr = np.asarray(
        Image.fromarray(base.astype(np.uint8)).resize((64, 48), Image.BILINEAR)
    )
    out = decode_png_batch([_png(arr)], 32, mode=0)[0]
    # PIL reference: resize shorter side to 32 + center crop
    img = Image.fromarray(arr)
    scale = 32 / min(img.size)
    img = img.resize(
        (round(img.width * scale), round(img.height * scale)), Image.BILINEAR
    )
    left = (img.width - 32) // 2
    top = (img.height - 32) // 2
    ref = np.asarray(img.crop((left, top, left + 32, top + 32)), np.float32) / 255
    # PIL antialiases downscales; the C++ path is plain bilinear — a small
    # mean divergence is expected (the standard 512->512 flow is identity)
    assert np.abs(out - ref).mean() < 0.05


def test_batch_and_corrupt_input():
    rng = np.random.RandomState(2)
    good = _png(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
    out = decode_png_batch([good] * 5, 16, mode=0, n_threads=2)
    assert out.shape == (5, 16, 16, 3)
    # corrupt data -> None (caller falls back to PIL)
    assert decode_png_batch([b"not a png"], 16, mode=0) is None


def test_loader_native_path(tmp_path):
    from genima_tpu.data.dataset import DiffusionDataLoader, Sample
    from genima_tpu.data.tokenizer import HashTokenizer

    rng = np.random.RandomState(3)
    samples = []
    for i in range(4):
        arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        p1, p2 = tmp_path / f"img{i}.png", tmp_path / f"cond{i}.png"
        Image.fromarray(arr).save(p1)
        Image.fromarray(arr).save(p2)
        samples.append(Sample(str(p1), str(p2), "x"))
    native = DiffusionDataLoader(
        samples, HashTokenizer(), batch_size=4, resolution=32, use_native=True,
        shuffle=False,
    )
    pil = DiffusionDataLoader(
        samples, HashTokenizer(), batch_size=4, resolution=32, use_native=False,
        shuffle=False,
    )
    b1, b2 = next(iter(native)), next(iter(pil))
    np.testing.assert_allclose(
        b1["pixel_values"], b2["pixel_values"], atol=1e-5
    )
    np.testing.assert_allclose(
        b1["conditioning_pixel_values"], b2["conditioning_pixel_values"],
        atol=1e-5,
    )


def test_uint8_decode_matches_float_path(tmp_path):
    """decode_png_batch_u8 (and the loader's emit_uint8 mode) produce the
    same pixels as the float path up to quantization."""
    from PIL import Image

    from genima_tpu.data.dataset import DiffusionDataLoader, Sample
    from genima_tpu.data.tokenizer import HashTokenizer

    rng = np.random.RandomState(3)
    img = tmp_path / "a.png"
    Image.fromarray(rng.randint(0, 255, (40, 56, 3), np.uint8)).save(img)
    samples = [Sample(str(img), str(img), "t")]
    tok = HashTokenizer()
    f32 = next(iter(DiffusionDataLoader(
        samples, tok, batch_size=1, resolution=32, num_workers=1,
    )))
    u8 = next(iter(DiffusionDataLoader(
        samples, tok, batch_size=1, resolution=32, num_workers=1,
        emit_uint8=True,
    )))
    assert u8["pixel_values"].dtype == np.uint8
    assert u8["conditioning_pixel_values"].dtype == np.uint8
    np.testing.assert_allclose(
        u8["pixel_values"].astype(np.float32) / 127.5 - 1.0,
        f32["pixel_values"], atol=1.01 / 127.5,
    )
    np.testing.assert_allclose(
        u8["conditioning_pixel_values"].astype(np.float32) / 255.0,
        f32["conditioning_pixel_values"], atol=1.01 / 255.0,
    )


def test_native_u8_decoder_matches_pil():
    from PIL import Image
    import io

    from genima_tpu.native import decode_png_batch_u8, get_lib

    if get_lib() is None:
        pytest.skip("native image_ops unavailable")
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (64, 48, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out = decode_png_batch_u8([buf.getvalue()], 32, n_threads=2)
    assert out is not None and out.shape == (1, 32, 32, 3)
    assert out.dtype == np.uint8
    # same resampler as the float native path: quantization only
    from genima_tpu.native import decode_png_batch

    f32 = decode_png_batch([buf.getvalue()], 32, mode=0, n_threads=2)
    np.testing.assert_allclose(
        out[0].astype(np.float32) / 255.0, f32[0], atol=1.01 / 255.0
    )


def test_trainer_normalizes_uint8_on_device():
    import jax.numpy as jnp

    from genima_tpu.diffusion.training import normalize_image_batch

    px = jnp.asarray(np.array([[0, 127, 255]], np.uint8))
    cn = jnp.asarray(np.array([[0, 127, 255]], np.uint8))
    p, c = normalize_image_batch(px, cn)
    np.testing.assert_allclose(
        np.asarray(p), [[-1.0, -0.00392157, 1.0]], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(c), [[0.0, 0.49803922, 1.0]], atol=1e-6
    )
    # f32 passes through untouched
    f = jnp.asarray(np.array([[0.5]], np.float32))
    p2, c2 = normalize_image_batch(f, f)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(f))
