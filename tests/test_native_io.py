"""Native IO runtime tests: build, decode parity with the Python codec,
threaded burst loads, corrupt-input handling."""

import numpy as np
import pytest

from dbsr_tpu.utils import native_io, png16


@pytest.fixture(scope="module")
def lib_available():
    if not native_io.native_available():
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("dtype,channels", [
    (np.uint8, 3), (np.uint16, 3), (np.uint16, 4), (np.uint16, 1),
])
def test_native_decode_matches_python(tmp_path, lib_available, dtype,
                                      channels):
    rng = np.random.RandomState(0)
    maxv = 255 if dtype == np.uint8 else 2**14
    arr = rng.randint(0, maxv, (24, 17, channels)).astype(dtype)
    p = str(tmp_path / "x.png")
    png16.write_png(p, arr)
    out = native_io.read_png(p)
    np.testing.assert_array_equal(out, arr)


def test_native_decodes_filtered_pngs(tmp_path, lib_available):
    """PIL writes Sub/Up/Avg/Paeth-filtered rows; exercise the C++
    unfilter paths."""
    from PIL import Image
    rng = np.random.RandomState(1)
    base = np.linspace(0, 255, 64 * 48).reshape(64, 48)
    arr = np.clip(base[..., None] + rng.randint(0, 20, (64, 48, 3)),
                  0, 255).astype(np.uint8)
    p = str(tmp_path / "f.png")
    Image.fromarray(arr).save(p, optimize=True)
    np.testing.assert_array_equal(native_io.read_png(p), arr)


def test_load_burst_threaded(tmp_path, lib_available):
    rng = np.random.RandomState(2)
    paths = []
    frames = []
    for i in range(6):
        a = rng.randint(0, 2**14, (48, 48, 4)).astype(np.uint16)
        p = str(tmp_path / f"im_raw_{i:02d}.png")
        png16.write_png(p, a)
        paths.append(p)
        frames.append(a)
    out = native_io.load_burst(paths)
    np.testing.assert_array_equal(out, np.stack(frames))


def test_load_burst_missing_file(tmp_path, lib_available):
    a = np.zeros((8, 8, 4), np.uint16)
    p = str(tmp_path / "a.png")
    png16.write_png(p, a)
    with pytest.raises(ValueError):
        native_io.load_burst([p, str(tmp_path / "missing.png")])


def test_corrupt_png_rejected(tmp_path, lib_available):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"not a png at all")
    with pytest.raises(ValueError):
        native_io.read_png(p)
