"""Composable transform tests: shared-roll semantics, value behavior."""

import numpy as np

from dbsr_tpu.data import transforms as T


def test_tofloat():
    im = (np.ones((4, 4, 3)) * 255).astype(np.uint8)
    out = T.ToFloat()(im)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 1.0)


def test_shared_roll_across_images():
    """One call's randomness applies identically to all images."""
    tf = T.Transform(T.RandomHorizontalFlip(probability=0.5)).seed(0)
    a = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
    b = a + 100
    for _ in range(8):
        oa, ob = tf(a, b)
        flipped_a = not np.array_equal(oa, a)
        flipped_b = not np.array_equal(ob, b)
        assert flipped_a == flipped_b


def test_jitter_brightness_range():
    tf = T.ToFloatAndJitter(brightness_jitter=0.3).seed(1)
    im = (np.ones((4, 4, 3)) * 128).astype(np.uint8)
    vals = [float(tf(im).mean()) for _ in range(16)]
    base = 128 / 255.0
    assert min(vals) >= base * np.exp(-0.3) - 1e-6
    assert max(vals) <= min(base * np.exp(0.3), 1.0) + 1e-6
    assert np.std(vals) > 0.01


def test_normalize_and_bgr():
    im = np.ones((2, 2, 3), np.float32) * np.array([1.0, 2.0, 3.0])
    out = T.Normalize([1.0, 2.0, 3.0], [1.0, 1.0, 1.0])(im)
    np.testing.assert_allclose(out, 0.0)
    np.testing.assert_allclose(T.ToBGR()(im)[0, 0], [3.0, 2.0, 1.0])


def test_grayscale_channels_equal():
    tf = T.ToGrayscale(probability=1.0)
    im = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    out = tf(im)
    assert out.shape == im.shape
    np.testing.assert_allclose(out[..., 0], out[..., 1])
    np.testing.assert_allclose(out[..., 1], out[..., 2])
