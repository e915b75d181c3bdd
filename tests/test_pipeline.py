"""Host pipeline tests: crop logic, samplers, prefetcher."""

import time

import numpy as np
import pytest

from dbsr_tpu.data.pipeline import (CropBatcher, DevicePrefetcher,
                                    IndexedImageSampler, RandomImageSampler,
                                    center_crop, random_resized_crop)


class Imgs:
    def __init__(self, n=3, hw=(60, 70), fail_every=None):
        self.n = n
        self.hw = hw
        self.fail_every = fail_every
        self.calls = 0

    def get_num_images(self):
        return self.n

    def get_image(self, i, info=None):
        self.calls += 1
        if self.fail_every and self.calls % self.fail_every == 0:
            raise IOError("flaky disk")
        rng = np.random.RandomState(i)
        return (rng.rand(*self.hw, 3) * 255).astype(np.uint8), {}


def test_center_crop():
    x = np.arange(8 * 10 * 1).reshape(8, 10, 1)
    c = center_crop(x, (4, 6))
    assert c.shape == (4, 6, 1)
    np.testing.assert_array_equal(c, x[2:6, 2:8])


def test_random_resized_crop_shape_and_content():
    rng = np.random.default_rng(0)
    frame = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    crop = random_resized_crop(rng, frame, (32, 32))
    assert crop.shape == (32, 32, 3)
    # with no scale/ar jitter, the crop is an exact sub-window
    found = False
    for r in range(33):
        for c in range(33):
            if np.allclose(frame[r:r + 32, c:c + 32], crop):
                found = True
    assert found


def test_random_resized_crop_with_scale_resizes():
    rng = np.random.default_rng(1)
    frame = np.random.RandomState(2).rand(128, 128, 3).astype(np.float32)
    crop = random_resized_crop(rng, frame, (32, 32),
                               scale_range=(1.5, 2.0))
    assert crop.shape == (32, 32, 3)


def test_random_sampler_failsafe_retries():
    ds = Imgs(fail_every=3)
    s = RandomImageSampler([ds], [1.0], samples_per_epoch=10)
    rng = np.random.default_rng(0)
    for _ in range(10):
        frame = s.sample(rng)
        assert frame.shape == (60, 70, 3)


def test_weighted_sampling():
    a, b = Imgs(n=1), Imgs(n=1)
    s = RandomImageSampler([a, b], [1.0, 0.0], samples_per_epoch=10)
    rng = np.random.default_rng(0)
    for _ in range(5):
        s.sample(rng)
    assert a.calls == 5 and b.calls == 0


def test_crop_batcher_batches():
    s = RandomImageSampler([Imgs()], [1.0], samples_per_epoch=8)
    b = CropBatcher(s, batch_size=4, crop_sz=(32, 32))
    batch = b.next_batch()
    assert batch.shape == (4, 32, 32, 3)
    # default transfer dtype is uint8 (4x fewer host->device bytes)
    assert batch.dtype == np.uint8
    assert len(b) == 2

    bf = CropBatcher(s, batch_size=2, crop_sz=(32, 32),
                     transfer_dtype="float32")
    fbatch = bf.next_batch()
    assert fbatch.dtype == np.float32
    assert 0.0 <= fbatch.min() and fbatch.max() <= 1.0


def test_prefetcher_yields_all_batches():
    count = [0]

    def make():
        count[0] += 1
        return np.full((2, 4, 4, 3), count[0], np.float32)

    got = list(DevicePrefetcher(make, 5))
    assert len(got) == 5
    assert float(got[-1][0, 0, 0, 0]) == 5.0


def test_prefetcher_propagates_errors():
    def bad():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        list(DevicePrefetcher(bad, 3))


def test_prefetcher_close_releases_blocked_worker():
    """Abandoning iteration mid-epoch (divergence abort) must not leave
    the feeder thread blocked on a full queue: close() drains + stops it
    so a retry epoch's new prefetcher owns the batcher exclusively."""
    calls = [0]

    def make():
        calls[0] += 1
        return np.zeros((2, 4, 4, 3), np.float32)

    pf = DevicePrefetcher(make, 100, depth=2)
    it = iter(pf)
    next(it)  # worker running; queue refills and worker blocks on put
    pf.close()
    assert not pf._thread.is_alive()
    produced = calls[0]
    time.sleep(0.2)  # a live worker would keep producing
    assert calls[0] == produced
    assert produced < 100


def test_prefetcher_close_idempotent_after_completion():
    pf = DevicePrefetcher(lambda: np.zeros((1,), np.float32), 3)
    assert len(list(pf)) == 3
    pf.close()  # harmless after normal completion
    pf.close()
