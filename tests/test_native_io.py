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


def test_native_jpeg_matches_pil(tmp_path):
    """Native libjpeg-turbo decode is bit-exact with PIL (same libjpeg)."""
    from PIL import Image

    from dbsr_tpu.utils.native_io import (load_jpeg_batch, native_available,
                                          read_jpeg)

    rng = np.random.RandomState(0)
    paths = []
    refs = []
    for i in range(4):
        img = (np.kron(rng.rand(28, 28, 3), np.ones((8, 8, 1))) * 255
               ).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(img).save(p, "JPEG", quality=92)
        paths.append(p)
        refs.append(np.asarray(Image.open(p).convert("RGB")))

    one = read_jpeg(paths[0])
    np.testing.assert_array_equal(one, refs[0])

    batch = load_jpeg_batch(paths, num_threads=2)
    assert batch.shape == (4,) + refs[0].shape
    for i in range(4):
        np.testing.assert_array_equal(batch[i], refs[i])


def test_dataset_loader_jpeg_path(tmp_path):
    """_load_image routes .jpg through the native path and returns RGB."""
    from PIL import Image

    from dbsr_tpu.data.datasets import _load_image

    img = (np.random.RandomState(1).rand(32, 48, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(p, "JPEG", quality=95)
    out = _load_image(p)
    assert out.shape == (32, 48, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out,
                                  np.asarray(Image.open(p).convert("RGB")))
