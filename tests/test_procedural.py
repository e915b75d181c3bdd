"""Procedural dead-leaves source imagery: generator statistics, pool
refresh semantics, trainer integration (zero-egress data path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbsr_tpu.data.procedural import (ProceduralImagePool, ProceduralImages,
                                      ProceduralPoolBatcher,
                                      dead_leaves_image,
                                      make_pool_prepare_fn)
from dbsr_tpu.data.synthetic import BurstConfig

HW = (48, 48)
GEN = dict(num_leaves=30)


def test_image_range_and_determinism():
    f = jax.jit(lambda k: dead_leaves_image(k, HW, **GEN))
    a = np.asarray(f(jax.random.key(0)))
    b = np.asarray(f(jax.random.key(0)))
    c = np.asarray(f(jax.random.key(1)))
    assert a.shape == HW + (3,)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).mean() > 0.01  # different keys differ
    # non-degenerate content: real structure in every channel
    assert a.std() > 0.05
    assert all(a[..., ch].std() > 0.02 for ch in range(3))


def test_image_has_natural_spectrum():
    """Dead leaves should have power concentrated at low frequencies
    (roughly 1/f^2 power spectrum), unlike white noise."""
    img = np.asarray(jax.jit(
        lambda k: dead_leaves_image(k, (64, 64), num_leaves=60))(
        jax.random.key(3)))
    gray = img.mean(-1)
    spec = np.abs(np.fft.fftshift(np.fft.fft2(gray - gray.mean()))) ** 2
    c = 32
    low = spec[c - 8:c + 8, c - 8:c + 8].sum()
    assert low / spec.sum() > 0.5, "expected low-frequency-dominated spectrum"


def test_pool_refresh_and_reuse():
    pool = ProceduralImagePool(6, HW, seed=1, chunk=4, **GEN)
    p0 = pool.refresh(0)
    assert p0.shape == (6,) + HW + (3,) and p0.dtype == jnp.uint8
    assert pool.refresh(0) is p0  # idempotent per round
    p1 = pool.refresh(1)
    assert not np.array_equal(np.asarray(p0), np.asarray(p1))


def test_pool_fold_in_process_changes_stream():
    a = ProceduralImagePool(2, HW, seed=1, chunk=2, **GEN)
    b = ProceduralImagePool(2, HW, seed=1, chunk=2, **GEN)
    b.fold_in_process(1)
    assert not np.array_equal(np.asarray(a.refresh(0)),
                              np.asarray(b.refresh(0)))


def test_batcher_epoch_refresh():
    pool = ProceduralImagePool(4, HW, seed=2, chunk=4, **GEN)
    b = ProceduralPoolBatcher(pool, batch_size=2, num_batches=2)
    h0 = b.next_batch()
    assert b.next_batch() is h0          # same epoch
    h1 = b.next_batch()                  # epoch 1 -> refresh
    assert not np.array_equal(np.asarray(h0), np.asarray(h1))


def test_pool_prepare_fn_synthesizes():
    cfg = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                      border_crop=8)
    pool = ProceduralImagePool(5, cfg.pre_crop_sz, seed=0, chunk=5, **GEN)
    prep = jax.jit(make_pool_prepare_fn(cfg, batch_size=4))
    batch = prep(jax.random.key(0), pool.refresh(0))
    assert batch["burst"].shape == (4, 3) + cfg.burst_hw + (4,)
    assert batch["frame_gt"].shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(batch["burst"])).all()
    # different keys -> different draws
    batch2 = prep(jax.random.key(1), pool.refresh(0))
    assert np.abs(np.asarray(batch["burst"]) -
                  np.asarray(batch2["burst"])).mean() > 1e-4


def test_host_dataset_contract():
    ds = ProceduralImages(4, hw=HW, seed=5, **GEN)
    assert len(ds) == 4 and ds.get_num_images() == 4
    im, meta = ds.get_image(3)
    assert im.shape == HW + (3,) and im.dtype == np.uint8
    im2, _ = ds.get_image(3)
    np.testing.assert_array_equal(im, im2)
    with pytest.raises(IndexError):
        ds.get_image(4)


def test_trainer_runs_on_pool(tmp_path):
    """End-to-end: tiny DBSR trained one epoch from a procedural pool with
    cast_uint8_inputs=False (the zero-egress campaign path)."""
    import optax

    from dbsr_tpu.models.dbsr import dbsrnet_tiny
    from dbsr_tpu.training.actors import make_synthetic_actor
    from dbsr_tpu.training.trainer import LoaderSpec, Trainer

    cfg = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                      border_crop=8, fused_resample=True)
    pool = ProceduralImagePool(4, cfg.pre_crop_sz, seed=0, chunk=4, **GEN)
    batcher = ProceduralPoolBatcher(pool, batch_size=2, num_batches=2)
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    trainer = Trainer(
        net, make_synthetic_actor(net, boundary_ignore=4),
        optax.adam(1e-4), [LoaderSpec("train", batcher)], cfg,
        str(tmp_path), net_name="tiny_proc",
        prepare_fn=make_pool_prepare_fn(cfg, batch_size=2),
        cast_uint8_inputs=False, print_interval=1)
    state = trainer.train(1, load_latest=False, fail_safe=False)
    assert int(state.step) == 2
    avgs = trainer.stats["train"].averages()
    assert np.isfinite(avgs["Loss/total"])


def test_generator_family_valid_images():
    """Every mixed-corpus generator yields [H, W, 3] float32 in [0, 1]
    with non-degenerate content, deterministic in the key."""
    from dbsr_tpu.data.procedural import GENERATORS

    for name, gen in GENERATORS.items():
        a = np.asarray(gen(jax.random.key(3), HW))
        b = np.asarray(gen(jax.random.key(3), HW))
        assert a.shape == HW + (3,), name
        assert a.dtype == np.float32, name
        assert a.min() >= 0.0 and a.max() <= 1.0, name
        assert a.std() > 0.01, (name, a.std())
        np.testing.assert_array_equal(a, b)


def test_mix_plan_proportions_and_determinism():
    from dbsr_tpu.data.procedural import MIXED_RECIPE, _mix_plan

    plan = _mix_plan(64, seed=5)
    assert len(plan) == 64
    counts = {n: plan.count(n) for n, _ in MIXED_RECIPE}
    for name, frac in MIXED_RECIPE:
        assert abs(counts[name] - frac * 64) <= 2, (name, counts)
    assert plan == _mix_plan(64, seed=5)
    assert plan != _mix_plan(64, seed=6)


def test_mixed_pool_refresh():
    pool = ProceduralImagePool(8, HW, seed=1, chunk=2, mix="mixed")
    arr = pool.refresh(0)
    assert arr.shape == (8,) + HW + (3,)
    assert arr.dtype == jnp.uint8
    # mixed pool differs from the dead-leaves-only pool of the same seed
    dl = ProceduralImagePool(8, HW, seed=1, chunk=2)
    assert not np.array_equal(np.asarray(arr), np.asarray(dl.refresh(0)))
