"""Functional validation of the realworld (BurstSR) path on
physically-consistent synthetic data at REAL scales.

The random-noise fixtures in test_burstsr.py prove plumbing; these
tests prove FUNCTION: a known Canon-vs-Samsung misregistration
(translation + 3x3 color transform + exposure ratio, planted by
util_scripts/make_synthetic_burstsr.py) must be recovered by the
shipped SpatialColorAlignment with the committed AlignLite aligner
artifact — the supervision mechanism `dbsr/default_realworld` and the
BurstSR eval protocol depend on."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_GEN = os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                    "make_synthetic_burstsr.py")
_spec = importlib.util.spec_from_file_location("make_synthetic_burstsr",
                                               _GEN)
gen = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(gen)

_ARTIFACT = os.path.join(os.path.dirname(__file__), os.pardir, "dbsr_tpu",
                         "artifacts", "align_lite_params.ckpt")


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fake_burstsr"))
    gen.generate_dataset(root, bursts=1, lr=96, n_frames=14, seed=3)
    return root


@pytest.mark.slow
def test_val_set_loads_and_exposure(fake_root):
    from dbsr_tpu.data.burstsr import get_burstsr_val_set

    sampler = get_burstsr_val_set(fake_root)
    assert len(sampler) == 1
    sample = sampler[0]
    assert sample["burst"].shape == (14, 80, 80, 4)
    assert sample["frame_gt"].shape == (640, 640, 3)
    assert np.isfinite(sample["burst"]).all()
    assert np.isfinite(sample["frame_gt"]).all()
    assert sample["exp_scale_factor"] == pytest.approx(
        gen.exp_scale_factor(), rel=1e-6)
    # burst values are black-level-subtracted normalized RAW in [0, ~1]
    assert 0.0 <= float(sample["burst"].min())
    assert float(sample["burst"].max()) <= 1.0


@pytest.mark.slow
def test_sca_recovers_known_misregistration(fake_root):
    """Hand SCA a perfect prediction (the clean scene) against the
    shifted + color-transformed GT: the aligned, color-matched output
    must sit far closer to the GT than the raw prediction does — the
    shipped aligner artifact generalizing to SCA's full-RGB inputs."""
    from dbsr_tpu.data.burstsr import get_burstsr_val_set
    from dbsr_tpu.evaluation.burstsr import _alignment_apply_from
    from dbsr_tpu.models.sca import make_sca
    from dbsr_tpu.training.checkpoint import load_checkpoint

    sampler = get_burstsr_val_set(fake_root)
    sample = sampler[0]
    gt = jnp.asarray(sample["frame_gt"])[None]
    burst = jnp.asarray(sample["burst"])[None]

    # the perfect prediction: the clean scene at the same center crop
    scene = np.load(os.path.join(
        fake_root, "val", sampler.dataset.burst_list[0],
        "scene_linear.npy"))
    r = (96 - 80) // 2
    pred = jnp.asarray(scene[8 * r:8 * r + 640, 8 * r:8 * r + 640])[None]

    # the SHIPPED binding: aligner-kind detection + coarse-to-fine
    _, raw = load_checkpoint(_ARTIFACT)
    ckpt_like = {"params": {"encoder": {
        "alignment_net": raw["params"]["params"]["alignment_net"]}}}
    sca = make_sca(_alignment_apply_from(ckpt_like), sr_factor=4)

    pred_warped, valid = jax.jit(sca)(pred, gt, burst)
    valid = valid.astype(jnp.float32)

    m = 24  # ignore warp/color boundary band
    crop = (slice(None), slice(m, -m), slice(m, -m))

    def masked_mse(a, b, v):
        d = ((a - b) ** 2 * v)[crop]
        return float(d.sum() / (v[crop].sum() * 3 + 1e-8))

    err_aligned = masked_mse(pred_warped, gt, valid)
    err_raw = masked_mse(pred, gt, jnp.ones_like(valid))
    assert float(valid[crop].mean()) > 0.5, "valid mask collapsed"
    assert err_aligned < 0.3 * err_raw, (err_aligned, err_raw)
