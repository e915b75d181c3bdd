"""16-bit PNG codec round-trip + cross-check against PIL for 8-bit."""

import numpy as np
import pytest

from dbsr_tpu.utils import png16


@pytest.mark.parametrize("dtype,channels", [
    (np.uint8, 1), (np.uint8, 3), (np.uint8, 4),
    (np.uint16, 1), (np.uint16, 3), (np.uint16, 4),
])
def test_roundtrip(tmp_path, dtype, channels):
    rng = np.random.RandomState(0)
    maxv = 255 if dtype == np.uint8 else 2**14
    arr = rng.randint(0, maxv, (13, 17, channels)).astype(dtype)
    p = str(tmp_path / "x.png")
    png16.write_png(p, arr)
    back = png16.read_png(p)
    np.testing.assert_array_equal(back, arr)


def test_2d_input_roundtrip(tmp_path):
    arr = np.arange(64, dtype=np.uint16).reshape(8, 8) * 100
    p = str(tmp_path / "g.png")
    png16.write_png(p, arr)
    back = png16.read_png(p)
    np.testing.assert_array_equal(back[..., 0], arr)


def test_pil_can_read_our_8bit(tmp_path):
    from PIL import Image
    arr = np.random.RandomState(1).randint(0, 255, (10, 12, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    png16.write_png(p, arr)
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), arr)


def test_we_can_read_pil_filtered_png(tmp_path):
    """PIL writes with scanline filters; exercise the unfilter paths."""
    from PIL import Image
    rng = np.random.RandomState(2)
    # smooth gradient + noise encourages PIL/zlib to use Sub/Up/Paeth
    base = np.linspace(0, 255, 64 * 48).reshape(64, 48)
    arr = np.clip(base[..., None] + rng.randint(0, 20, (64, 48, 3)),
                  0, 255).astype(np.uint8)
    p = str(tmp_path / "f.png")
    Image.fromarray(arr).save(p, optimize=True)
    back = png16.read_png(p)
    np.testing.assert_array_equal(back, arr)


def test_16bit_precision_preserved(tmp_path):
    """The reason this codec exists: 2^14-scale values survive exactly."""
    arr = np.array([[[0, 1, 16383], [16384, 9999, 12345]]], np.uint16)
    p = str(tmp_path / "prec.png")
    png16.write_png(p, arr)
    np.testing.assert_array_equal(png16.read_png(p), arr)
