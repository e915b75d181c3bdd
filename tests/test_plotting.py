"""Tensor-display helper tests (reference utils/plotting.py parity)."""

import numpy as np
import pytest

from dbsr_tpu.utils.plotting import describe, save_tensor, tensor_grid, to_display


def test_to_display_layouts():
    # HWC RGB passthrough
    rgb = np.random.RandomState(0).rand(8, 10, 3)
    out = to_display(rgb)
    assert out.shape == (8, 10, 3) and out.dtype == np.uint8
    # CHW auto-transpose
    out2 = to_display(rgb.transpose(2, 0, 1))
    np.testing.assert_array_equal(out, out2)
    # grayscale HW
    g = to_display(np.ones((5, 6)))
    assert g.shape == (5, 6, 3)
    # packed RGGB -> RGB
    raw = to_display(np.random.RandomState(1).rand(4, 4, 4))
    assert raw.shape == (4, 4, 3)


def test_to_display_value_range():
    a = np.array([[0.0, 0.5], [1.0, 2.0]])
    out = to_display(a, value_range=(0.0, 2.0))
    assert out[0, 0, 0] == 0 and out[1, 1, 0] == 255
    assert out[1, 0, 0] in (127, 128)


def test_save_tensor_roundtrip(tmp_path):
    from PIL import Image
    a = np.random.RandomState(2).rand(6, 7, 3)
    p = str(tmp_path / "t.png")
    save_tensor(a, p, value_range=(0.0, 1.0))
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, to_display(a, (0.0, 1.0)))


def test_tensor_grid_shape():
    tiles = [np.random.RandomState(i).rand(8, 8, 3) for i in range(5)]
    grid = tensor_grid(tiles, cols=3, pad=2)
    assert grid.shape == (2 * 8 + 2, 3 * 8 + 2 * 2, 3)


def test_describe_flags_nonfinite():
    a = np.array([1.0, np.nan, np.inf])
    s = describe(a, "x")
    assert "nonfinite=2" in s and "shape=(3,)" in s
