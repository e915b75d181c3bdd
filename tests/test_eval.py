"""End-to-end evaluation-slice test: generate a tiny SyntheticBurstVal-
format dataset, run a checkpointed tiny net through compute_score /
save_results, verify saved-vs-recomputed score consistency (the 2^14
quantization protocol)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dbsr_tpu.data.datasets import SyntheticBurstVal, write_synthetic_burst_val
from dbsr_tpu.data.synthetic import BurstConfig, rgb2rawburst
from dbsr_tpu.evaluation import synburst
from dbsr_tpu.evaluation.network_param import NetworkParam
from dbsr_tpu.models.dbsr import dbsrnet_tiny
from dbsr_tpu.training.checkpoint import save_checkpoint
from dbsr_tpu.training.state import TrainState

CFG = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                  border_crop=4, max_translation=3.0, max_rotation=0.5)


@pytest.fixture(scope="module")
def val_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synval"))
    samples = []
    for i in range(3):
        img = jnp.asarray(np.random.RandomState(i).rand(
            *CFG.pre_crop_sz, 3).astype(np.float32))
        out = rgb2rawburst(jax.random.key(i), img, CFG)
        samples.append({"burst": out["burst"], "frame_gt": out["frame_gt"],
                        "meta": {"gains": 1.0}})
    write_synthetic_burst_val(root, samples)
    return root


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt"))
    net = dbsrnet_tiny(upsample_factor=4)
    burst = jnp.zeros((1, 3) + CFG.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst)
    state = TrainState.create(params, optax.adam(1e-4))
    path = save_checkpoint(d, "tiny", 1, state, net=net)
    return path


def _dataset(root):
    return SyntheticBurstVal(root, burst_size=CFG.burst_size, num_bursts=3)


def test_val_set_roundtrip(val_root):
    ds = _dataset(val_root)
    burst, gt, meta = ds[0]
    assert burst.shape == (3, 8, 8, 4)
    assert gt.shape == (32, 32, 3)
    assert burst.dtype == np.float32
    assert 0.0 <= burst.min() and burst.max() <= 1.0
    # written by our writer -> no cv2 channel swap applied
    assert not ds.cv2_channel_order


def test_compute_score_runs(val_root, tiny_ckpt):
    nets = [NetworkParam(checkpoint_path=tiny_ckpt, display_name="tiny")]
    scores = synburst.compute_score(
        nets, val_root, boundary_ignore=4, with_lpips=False,
        dataset=_dataset(val_root))
    assert "psnr" in scores and "ssim" in scores
    assert np.isfinite(scores["psnr"]["tiny"])
    # random-init net should score poorly but in a sane range
    assert 0 < scores["psnr"]["tiny"] < 40


def test_saved_results_match_recomputed(val_root, tiny_ckpt, tmp_path):
    """The quantization protocol: scoring saved uint16 predictions equals
    scoring the live net (reference `compute_score.py:110-111`)."""
    nets = [NetworkParam(checkpoint_path=tiny_ckpt, display_name="tiny")]
    out_dir = str(tmp_path / "saved")
    synburst.save_results(nets, val_root, out_dir,
                          dataset=_dataset(val_root))

    live = synburst.compute_score(nets, val_root, boundary_ignore=4,
                                  with_lpips=False,
                                  dataset=_dataset(val_root))
    saved_nets = [NetworkParam(
        saved_results_path=os.path.join(out_dir, "tiny"),
        display_name="tiny")]
    saved = synburst.compute_score(saved_nets, val_root, boundary_ignore=4,
                                   with_lpips=False,
                                   dataset=_dataset(val_root))
    assert live["psnr"]["tiny"] == pytest.approx(saved["psnr"]["tiny"],
                                                 abs=1e-3)
    assert live["ssim"]["tiny"] == pytest.approx(saved["ssim"]["tiny"],
                                                 abs=1e-4)


def test_burst_size_override(val_root, tiny_ckpt):
    nets = [NetworkParam(checkpoint_path=tiny_ckpt, burst_sz=2)]
    scores = synburst.compute_score(nets, val_root, boundary_ignore=4,
                                    with_lpips=False,
                                    dataset=_dataset(val_root))
    (name,) = scores["psnr"].keys()
    assert name.endswith("_bsz02")
    assert np.isfinite(scores["psnr"][name])


def test_report_formatting():
    from dbsr_tpu.evaluation.display import generate_formatted_report
    rep = generate_formatted_report(
        ["netA", "netB"],
        {"psnr": {"netA": 39.1, "netB": 38.2},
         "ssim": {"netA": 0.95, "netB": 0.94}})
    assert "netA" in rep and "psnr" in rep and "39.1" in rep


def test_visualize_writes_panels_and_viewer(val_root, tiny_ckpt, tmp_path):
    """Interactive-viewer parity (reference visualize_results.py +
    opencv_plotting.py): per-pane PNGs and a self-contained index.html
    with zoom/pan/toggle controls."""
    from dbsr_tpu.evaluation.visualize import visualize_synburst

    nets = [NetworkParam(checkpoint_path=tiny_ckpt, display_name="tiny")]
    out = str(tmp_path / "vis")
    visualize_synburst(nets, val_root, out, max_bursts=2,
                       boundary_ignore=4, dataset=_dataset(val_root))
    d = os.path.join(out, "tiny")
    files = sorted(os.listdir(d))
    assert "index.html" in files
    pngs = [f for f in files if f.endswith(".png")]
    # 2 bursts x (3 panes + 1 panel)
    assert len(pngs) == 8
    page = open(os.path.join(d, "index.html")).read()
    assert "prediction" in page and "ground truth" in page
    # panes referenced in the page exist on disk
    import json as _json
    data = _json.loads(page[page.index("const DATA = ") + 13:
                            page.index(";\nlet bi")])
    assert len(data) == 2
    for e in data:
        for rel in e["panes"].values():
            assert os.path.exists(os.path.join(d, rel))


def test_batched_scores_independent_of_batch_size(val_root, tiny_ckpt):
    """Per-burst protocol scores must be identical whatever the forward
    batching (tail padding discards the padded rows)."""
    nets = [NetworkParam(checkpoint_path=tiny_ckpt, display_name="tiny")]
    ds = _dataset(val_root)
    per = [synburst.compute_score(nets, val_root, boundary_ignore=4,
                                  with_lpips=False, dataset=ds,
                                  batch_size=bs) for bs in (1, 2, 3, 8)]
    for s in per[1:]:
        assert s["psnr"]["tiny"] == pytest.approx(per[0]["psnr"]["tiny"],
                                                  abs=1e-5)
        assert s["ssim"]["tiny"] == pytest.approx(per[0]["ssim"]["tiny"],
                                                  abs=1e-6)


def test_iter_burst_batches_and_padding(val_root):
    ds = _dataset(val_root)
    batches = list(synburst._iter_burst_batches(ds, 3, 2, None))
    assert [b[1].shape[0] for b in batches] == [2, 1]
    names = [m["burst_name"] for metas, _, _ in batches for m in metas]
    assert len(set(names)) == 3
    tail = synburst._pad_to(batches[-1][1], 4)
    assert tail.shape[0] == 4
    np.testing.assert_array_equal(tail[1], tail[3])  # repeats last row

    # propagates reader errors
    class Broken:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(synburst._iter_burst_batches(Broken(), 2, 2, None))


def test_u16_transfer_roundtrip_exact():
    """_host_u16/_dev_f32 must be bit-exact for 2^14-scaled PNG data —
    the eval protocol's transfer encoding halves relay bytes and must not
    perturb scores."""
    rng = np.random.default_rng(0)
    ints = rng.integers(0, 2**14 + 1, size=(2, 5, 6, 3), dtype=np.uint16)
    f = ints.astype(np.float32) / (2**14)
    u = synburst._host_u16(f)
    assert u.dtype == np.uint16
    np.testing.assert_array_equal(u, ints)
    back = np.asarray(synburst._dev_f32(jnp.asarray(u)))
    np.testing.assert_array_equal(back, f)
    # f32 passthrough is a no-op
    same = synburst._dev_f32(jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(same), f)


def test_trajectory_matches_per_epoch_scores(val_root, tmp_path):
    """compute_score_trajectory (one staged val set + one shared graph)
    must reproduce per-epoch compute_score exactly."""
    ws = str(tmp_path)
    d = os.path.join(ws, "dbsr", "traj_cfg")
    net = dbsrnet_tiny(upsample_factor=4)
    burst = jnp.zeros((1, 3) + CFG.burst_hw + (4,))
    for e, key in ((1, 11), (2, 22)):
        params = net.init(jax.random.key(key), burst)
        state = TrainState.create(params, optax.adam(1e-4))
        save_checkpoint(d, "tiny_traj", e, state, net=net)

    traj = synburst.compute_score_trajectory(
        "dbsr", "traj_cfg", val_root, workspace_dir=ws,
        net_name="tiny_traj", boundary_ignore=4, batch_size=2,
        dataset=_dataset(val_root))
    assert sorted(traj["psnr"]) == ["dbsr_traj_cfg_ep0001",
                                    "dbsr_traj_cfg_ep0002"]

    for e in (1, 2):
        nets = [NetworkParam(module="dbsr", parameter="traj_cfg", epoch=e,
                             net_name="tiny_traj")]
        single = synburst.compute_score(
            nets, val_root, workspace_dir=ws, boundary_ignore=4,
            with_lpips=False, batch_size=2, dataset=_dataset(val_root))
        key = f"dbsr_traj_cfg_ep{e:04d}"
        for m in ("psnr", "ssim"):
            assert traj[m][key] == pytest.approx(
                list(single[m].values())[0], abs=1e-5), (m, e)
    # the two differently-initialized epochs must not score identically
    assert traj["psnr"]["dbsr_traj_cfg_ep0001"] != \
        traj["psnr"]["dbsr_traj_cfg_ep0002"]


def test_dbsr_zoo_experiment_resolves():
    """The model-zoo eval spec enumerates the committed campaign
    artifacts and each one rebuilds its network from the embedded
    net_spec (fresh-clone zero-training scoring path)."""
    from dbsr_tpu.evaluation.experiments.dbsr_zoo import main
    from dbsr_tpu.training.checkpoint import load_network

    nets = main()
    assert nets, "no zoo artifacts"
    for n in nets:
        assert os.path.exists(n.checkpoint_path), n.checkpoint_path
        net, params, header = load_network(n.checkpoint_path)
        assert header.get("params_only") is True
        assert "encoder" in params["params"]
        assert n.get_display_name().startswith("dbsr_campaign")
