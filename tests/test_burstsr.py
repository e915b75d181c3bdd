"""BurstSR dataset/processing tests with on-disk fixtures."""

import os
import pickle

import numpy as np
import pytest

from dbsr_tpu.data.burstsr import (BurstSRDataset, BurstSRProcessing,
                                   CanonImage, IndexedBurstSampler,
                                   RandomBurstSampler, SamsungRAWImage)
from dbsr_tpu.utils.png16 import write_png


def _make_fixture(root, split="val", names=("0001_0001",), lr=32, scale=4,
                  n_frames=4):
    """Write a minimal BurstSR-format dataset (plain-dict EXIF)."""
    rng = np.random.RandomState(0)
    for name in names:
        d = os.path.join(root, split, name)
        for i in range(n_frames):
            fd = os.path.join(d, f"samsung_{i:02d}")
            os.makedirs(fd, exist_ok=True)
            raw = rng.randint(64, 1023, (lr, lr, 4)).astype(np.uint16)
            write_png(os.path.join(fd, "im_raw.png"), raw)
            meta = {
                "black_level": [64, 64, 64, 64],
                "cam_wb": [2.0, 1.0, 1.0, 1.5],
                "daylight_wb": [2.0, 1.0, 1.0, 1.5],
                "color_matrix": np.eye(3).tolist(),
                "exif_data": {"exposure": 0.01, "f_number": 1.7,
                              "iso": 100,
                              "noise_profile": np.array(
                                  [[1e-3, 1e-5]] * 3)},
            }
            with open(os.path.join(fd, "meta_info.pkl"), "wb") as f:
                pickle.dump(meta, f)
        gd = os.path.join(d, "canon")
        os.makedirs(gd, exist_ok=True)
        gt = rng.randint(512, 16383, (lr * scale, lr * scale, 3)).astype(
            np.uint16)
        write_png(os.path.join(gd, "im_raw.png"), gt)
        meta = {
            "black_level": [512, 512, 512, 512],
            "cam_wb": [2.1, 1.0, 1.0, 1.6],
            "daylight_wb": [2.1, 1.0, 1.0, 1.6],
            "rgb_xyz_matrix": np.eye(4, 3).tolist(),
            "exif_data": {"exposure": 0.02, "f_number": 4.0, "iso": 200},
        }
        with open(os.path.join(gd, "meta_info.pkl"), "wb") as f:
            pickle.dump(meta, f)


@pytest.fixture
def burstsr_root(tmp_path):
    # use scene ids present in the val split spec (0008, 0010)
    _make_fixture(str(tmp_path), "val", ("0008_0001", "0010_0002"))
    return str(tmp_path)


def test_dataset_lists_split_bursts(burstsr_root):
    ds = BurstSRDataset(burstsr_root, split="val")
    # 0008 and 0010 are both in the val spec list
    assert ds.get_num_bursts() == 2
    info = ds.get_burst_info(0)
    # burst_size reflects the frames present on disk (4 in the fixture,
    # 14 for the real dataset)
    assert info["burst_size"] == 4


def test_samsung_image_accessors(burstsr_root):
    ds = BurstSRDataset(burstsr_root, split="val")
    frames, gt, info = ds.get_burst(0, [0, 1])
    f = frames[0]
    assert f.shape() == (32, 32, 4)
    assert f.get_exposure_time() == pytest.approx(0.01)
    assert f.get_iso() == 100
    assert f.get_noise_profile().shape == (3, 2)
    data = f.get_image_data(substract_black_level=True, normalize=True)
    assert data.max() <= 1.0
    assert isinstance(gt, CanonImage)
    assert gt.shape() == (128, 128, 3)


def test_processing_output_shapes(burstsr_root):
    ds = BurstSRDataset(burstsr_root, split="val")
    proc = BurstSRProcessing(crop_sz=16, substract_black_level=True,
                             random_crop=False)
    sampler = IndexedBurstSampler(ds, burst_size=3, processing=proc)
    out = sampler[0]
    assert out["burst"].shape == (3, 16, 16, 4)
    assert out["frame_gt"].shape == (64, 64, 3)
    assert out["burst"].dtype == np.float32
    assert np.isfinite(out["exp_scale_factor"])
    # exposure normalization: light_burst/light_canon =
    # (0.01*100/1.7^2) / (0.02*200/4^2) = 0.3460/0.25 = 1.384
    assert out["exp_scale_factor"] == pytest.approx(
        (0.01 * 100 / 1.7**2) / (0.02 * 200 / 4.0**2), rel=1e-5)


def test_processing_random_flip_preserves_shapes(burstsr_root):
    ds = BurstSRDataset(burstsr_root, split="val")
    proc = BurstSRProcessing(crop_sz=16, random_flip=True,
                             substract_black_level=True)
    sampler = IndexedBurstSampler(ds, burst_size=2, processing=proc, seed=3)
    for i in range(4):  # multiple draws hit flip branches
        out = sampler[i % 2]
        assert out["burst"].shape == (2, 16, 16, 4)
        assert out["frame_gt"].shape == (64, 64, 3)


def test_frame_id_selection_pads_short_bursts(burstsr_root):
    ds = BurstSRDataset(burstsr_root, split="val")
    proc = BurstSRProcessing(crop_sz=16, random_crop=False)
    sampler = IndexedBurstSampler(ds, burst_size=6, processing=proc)
    # dataset info says burst_size 14 but only 4 frames exist on disk;
    # select from the available 4 to avoid file-not-found
    ids = sampler._select_ids(4)
    assert len(ids) == 6
    assert ids[0] == 0
    assert all(0 <= i < 4 for i in ids)


def test_canon_generate_processed_image():
    im = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    meta = {"norm_factor": 1.0, "black_level": [0.1, 0.1, 0.1],
            "cam_wb": [2.0, 1.0, 1.5], "black_level_subtracted": False,
            "while_balance_applied": False}
    out = CanonImage.generate_processed_image(im, meta)
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_burstsr_eval_end_to_end(burstsr_root, tmp_path):
    """Full aligned-metric evaluation path: tiny checkpoint -> BurstSR
    fixture -> SCA (flow from the model's own alignment net) -> masked
    PSNR/SSIM report."""
    import jax
    import jax.numpy as jnp
    import optax

    from dbsr_tpu.data.burstsr import BurstSRDataset, BurstSRProcessing, \
        IndexedBurstSampler
    from dbsr_tpu.evaluation.burstsr import compute_score
    from dbsr_tpu.evaluation.network_param import NetworkParam
    from dbsr_tpu.models.dbsr import dbsrnet_tiny
    from dbsr_tpu.training.checkpoint import save_checkpoint
    from dbsr_tpu.training.state import TrainState

    net = dbsrnet_tiny(upsample_factor=4)
    burst_shape = (1, 3, 16, 16, 4)
    params = net.init(jax.random.key(0), np.zeros(burst_shape, np.float32))
    state = TrainState.create(params, optax.adam(1e-4))
    ckpt_path = save_checkpoint(str(tmp_path), "tiny", 1, state, net=net)

    ds = BurstSRDataset(burstsr_root, split="val")
    proc = BurstSRProcessing(crop_sz=16, substract_black_level=True,
                             random_crop=False)
    sampler = IndexedBurstSampler(ds, burst_size=3, processing=proc)

    scores = compute_score(
        [NetworkParam(checkpoint_path=ckpt_path, display_name="tiny")],
        dataset_root="", dataset=sampler, boundary_ignore=4,
        with_lpips=False, max_bursts=1, sr_factor=2)
    assert np.isfinite(scores["psnr"]["tiny"])
    assert -1.0 <= scores["ssim"]["tiny"] <= 1.0


def test_default_realworld_config_end_to_end(burstsr_root, tmp_path):
    """Drive configs/dbsr/default_realworld.run on fixtures end to end
    (VERDICT r2 #9): restore-from-synthetic-checkpoint warm start, one
    fine-tune epoch on fixture bursts, checkpoint written, finite stats."""
    import jax
    import optax

    from dbsr_tpu.configs.dbsr import default_realworld
    from dbsr_tpu.environment import Settings
    from dbsr_tpu.models.dbsr import dbsrnet_tiny
    from dbsr_tpu.training.checkpoint import (load_checkpoint,
                                              resolve_checkpoint,
                                              save_checkpoint)
    from dbsr_tpu.training.state import TrainState

    ws = str(tmp_path / "ws")
    syn_dir = os.path.join(ws, "dbsr", "default_synthetic")

    # pretend-synthetic tiny checkpoint (PWC aligner; upsample 4 matches
    # the fixture's x4-of-packed ground truth with sr_factor=2)
    net = dbsrnet_tiny(upsample_factor=4)
    params = net.init(jax.random.key(0),
                      np.zeros((1, 3, 16, 16, 4), np.float32))
    state = TrainState.create(params, optax.adam(1e-4))
    save_checkpoint(syn_dir, "dbsr_synthetic", 1, state, net=net)

    # train split fixture (the shared fixture writes only "val")
    _make_fixture(burstsr_root, "train", ("0001_0001", "0002_0001"))

    settings = Settings()
    settings.env.workspace_dir = ws
    settings.env.tensorboard_dir = str(tmp_path / "tb")
    settings.env.burstsr_dir = burstsr_root
    settings.batch_size = 2
    settings.crop_sz = 16
    settings.burst_sz = 3
    settings.sr_factor = 2
    settings.steps_per_epoch = 2
    settings.epochs = 1
    settings.multi_device = False

    default_realworld.run(settings)

    ck = resolve_checkpoint(os.path.join(ws, "dbsr", "default_realworld"),
                            "dbsr_realworld")
    assert ck is not None and ck.endswith("_ep0001.ckpt")
    header, raw = load_checkpoint(ck)
    assert header["epoch"] == 1
    stats = header["stats"]["train"]
    assert np.isfinite(stats["Loss/total"])
    # warm start actually copied the synthetic weights into epoch 0
    ck0 = resolve_checkpoint(
        os.path.join(ws, "dbsr", "default_realworld"), "dbsr_realworld",
        epoch=0)
    _, raw0 = load_checkpoint(ck0)
    leaf = raw0["params"]["params"]["decoder"]
    want = params["params"]["decoder"]
    k = next(iter(leaf))
    first = lambda t: next(iter(jax.tree_util.tree_leaves(t)))  # noqa: E731
    np.testing.assert_allclose(first(leaf[k]), np.asarray(first(want[k])),
                               atol=1e-7)
