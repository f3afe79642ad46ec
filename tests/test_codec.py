import numpy as np
import pytest

from wikicrawl.codec import (
    decode,
    encode,
    lossy_decode,
    lossy_encode,
    phash64,
    png_decode,
    png_encode,
    psnr,
)


def img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    px = img(37, 23, 1)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_lossy_roundtrip_psnr_over_40():
    px = img(64, 48, 2)
    out = lossy_decode(lossy_encode(px))
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0


def test_lossy_deterministic():
    px = img(16, 16, 3)
    assert lossy_encode(px) == lossy_encode(px)


def test_fmt_dispatch():
    px = img(8, 8, 4)
    assert np.array_equal(decode(encode(px, "png"), "png"), px)
    assert psnr(px, decode(encode(px, "jpeg"), "jpeg")) >= 40.0
    with pytest.raises(ValueError):
        encode(px, "gif")


def test_phash_properties():
    a = img(32, 32, 5)
    assert phash64(a) == phash64(a)  # deterministic
    assert isinstance(phash64(a), int)
    assert phash64(a) != phash64(img(32, 32, 6))  # distinct content
    # int64-representable
    assert -(2**63) <= phash64(a) < 2**63
    # robust to mild lossy recompression on structured (non-noise) content
    grad = np.broadcast_to(
        np.linspace(0, 255, 32, dtype=np.uint8)[None, :, None], (32, 32, 3)
    ).copy()
    assert phash64(lossy_decode(lossy_encode(grad))) == phash64(grad)


def test_psnr_identical_is_inf():
    a = img(8, 8, 7)
    assert psnr(a, a) == float("inf")
