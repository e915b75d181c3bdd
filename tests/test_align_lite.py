"""AlignLite aligner: contract, actor, graft into DBSRNet(flow_net='lite'),
checkpoint-kind detection, and single-batch learnability (the property
PWC-from-scratch lacks on this regime — see ``models/align_lite.py``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dbsr_tpu.data.procedural import dead_leaves_image
from dbsr_tpu.data.synthetic import BurstConfig, rgb2rawburst
from dbsr_tpu.models.align_lite import AlignLiteNet, BurstAlignLite
from dbsr_tpu.training.actors import make_lite_flow_actor

CFG = BurstConfig(burst_size=3, crop_sz=(64, 64), downsample_factor=2,
                  border_crop=16, max_translation=8.0, max_rotation=0.5,
                  add_noise=False)


@pytest.fixture(scope="module")
def batch():
    img = dead_leaves_image(jax.random.key(5), CFG.pre_crop_sz,
                            num_leaves=80)
    out = jax.jit(lambda k: rgb2rawburst(k, img, CFG))(jax.random.key(7))
    return jax.tree.map(lambda x: x[None], out)  # add batch dim


def test_shapes_pyramid_and_actor(batch):
    net = BurstAlignLite()
    params = jax.jit(net.init)(jax.random.key(0), batch["burst"])
    flow = jax.jit(net.apply)(params, batch["burst"])
    N = CFG.burst_size
    h, w = batch["burst"].shape[2:4]
    assert flow.shape == (1, N - 1, h, w, 2)
    assert flow.dtype == jnp.float32

    flow2, aux = jax.jit(
        lambda p, b: net.apply(p, b, return_pyramid=True))(
        params, batch["burst"])
    np.testing.assert_array_equal(np.asarray(flow), np.asarray(flow2))
    assert set(aux["pyramid"]) == {0, 1, 2}
    for lvl, f in aux["pyramid"].items():
        assert f.shape[-3:] == (h >> lvl, w >> lvl, 2), (lvl, f.shape)
    # refined full-res flow IS pyramid level 0
    np.testing.assert_array_equal(
        np.asarray(aux["pyramid"][0]).reshape(flow.shape),
        np.asarray(flow))

    actor = make_lite_flow_actor(net)
    (loss, stats), grads = jax.jit(
        jax.value_and_grad(lambda p: actor(p, batch), has_aux=True))(params)
    assert np.isfinite(float(loss))
    assert float(stats["Stat/epe"]) >= 0
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_learns_fixed_batch_fast(batch):
    """~30 Adam steps on one fixed batch must cut the EPE well below the
    zero-flow baseline — the direct-supervision learnability that PWC's
    degenerate small-input pyramid lacks."""
    net = BurstAlignLite()
    params = jax.jit(net.init)(jax.random.key(1), batch["burst"])
    actor = make_lite_flow_actor(net)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, stats), g = jax.value_and_grad(
            actor, has_aux=True)(params, batch)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, stats

    epe0 = float(jax.jit(actor)(params, batch)[1]["Stat/epe"])
    for _ in range(30):
        params, opt, stats = step(params, opt)
    epe = float(stats["Stat/epe"])
    assert epe < 0.6 * epe0, (epe, epe0)


def test_graft_lite_into_dbsrnet(tmp_path, batch):
    from dbsr_tpu.configs.dbsr.default_synthetic import \
        graft_alignment_params
    from dbsr_tpu.models.dbsr import dbsrnet_tiny
    from dbsr_tpu.training.checkpoint import save_checkpoint
    from dbsr_tpu.training.state import TrainState

    flow_net = BurstAlignLite()
    fparams = jax.jit(flow_net.init)(jax.random.key(1), batch["burst"])
    state = TrainState.create(fparams, optax.adam(1e-4))
    ckpt = save_checkpoint(str(tmp_path), "align_lite", 3, state,
                           net=flow_net)

    net = dbsrnet_tiny(upsample_factor=4, flow_net="lite",
                       train_alignment=False)
    dparams = jax.jit(net.init)(jax.random.key(2), batch["burst"])
    grafted = graft_alignment_params(dparams, ckpt)

    got = grafted["params"]["encoder"]["alignment_net"]
    want = fparams["params"]["alignment_net"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got, want)

    # grafted DBSR reports the standalone net's flow as its offsets
    _, aux = jax.jit(net.apply)(grafted, batch["burst"])
    flow = jax.jit(flow_net.apply)(fparams, batch["burst"])
    np.testing.assert_allclose(np.asarray(aux["offsets"]),
                               np.asarray(flow), atol=1e-5)

    # a PWC checkpoint must NOT graft into a lite-aligner DBSR
    from dbsr_tpu.models.pwcnet import BurstFlowNet
    pwc = BurstFlowNet()
    pparams = jax.jit(pwc.init)(jax.random.key(3), batch["burst"])
    pckpt = save_checkpoint(str(tmp_path / "p"), "pwcnet_synth", 1,
                            TrainState.create(pparams, optax.adam(1e-4)),
                            net=pwc)
    with pytest.raises((ValueError, KeyError)):
        graft_alignment_params(dparams, pckpt)


def test_flow_net_kind_and_preference(tmp_path, batch):
    """default_synthetic picks the align_lite checkpoint over the pwcnet
    one and derives flow_net='lite' from its header."""
    from dbsr_tpu.configs.dbsr.default_synthetic import (find_pretrained_flow,
                                                         flow_net_kind)
    from dbsr_tpu.training.checkpoint import save_checkpoint
    from dbsr_tpu.training.state import TrainState

    class Env:
        workspace_dir = str(tmp_path)

    class S:
        env = Env()

    assert find_pretrained_flow(S()) is None

    pwc_dir = os.path.join(str(tmp_path), "pwcnet", "pretrain_synthetic")
    flow_net = BurstAlignLite()
    fparams = jax.jit(flow_net.init)(jax.random.key(1), batch["burst"])
    state = TrainState.create(fparams, optax.adam(1e-4))
    pwc_ckpt = save_checkpoint(pwc_dir, "pwcnet_synth", 2, state)
    assert find_pretrained_flow(S()) == pwc_ckpt
    assert flow_net_kind(pwc_ckpt) == "pwc"

    lite_dir = os.path.join(str(tmp_path), "align_lite",
                            "pretrain_synthetic")
    lite_ckpt = save_checkpoint(lite_dir, "align_lite", 5, state,
                                net=flow_net)
    assert find_pretrained_flow(S()) == lite_ckpt
    assert flow_net_kind(lite_ckpt) == "lite"

    class S2(S):
        pwc_checkpoint = pwc_ckpt

    assert find_pretrained_flow(S2()) == pwc_ckpt


def test_align_lite_net_requires_mult_of_4():
    net = AlignLiteNet()
    with pytest.raises(AssertionError):
        net.init(jax.random.key(0), jnp.zeros((1, 18, 18, 3)),
                 jnp.zeros((1, 18, 18, 3)))


def test_sca_alignment_apply_detects_lite(batch):
    """_alignment_apply_from must bind the right aligner module based on
    the checkpoint's alignment_net parameter structure (SCA for
    realworld fine-tune/eval of lite-aligner checkpoints)."""
    from dbsr_tpu.evaluation.burstsr import _alignment_apply_from
    from dbsr_tpu.models.dbsr import dbsrnet_tiny

    net = dbsrnet_tiny(upsample_factor=4, flow_net="lite",
                       train_alignment=False)
    dparams = jax.jit(net.init)(jax.random.key(2), batch["burst"])
    apply_fn = _alignment_apply_from(dparams)
    src = jnp.zeros((2, 16, 16, 3))
    flow = jax.jit(apply_fn)(src, src)
    assert flow.shape == (2, 16, 16, 2)


def test_target_repeat_dedup_matches_broadcast():
    """Extract-once-and-broadcast-the-pyramid (target_repeat) must equal
    broadcast-the-image-first, for both aligners — the per-burst
    reference dedup AlignedEncoder relies on."""
    from dbsr_tpu.models.pwcnet import PWCNet

    key = jax.random.key(11)
    B, R, H, W = 2, 3, 16, 16
    src = jax.random.uniform(key, (B * R, H, W, 3))
    tgt_unique = jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W, 3))
    tgt_bcast = jnp.repeat(tgt_unique, R, axis=0)

    lite = AlignLiteNet()
    params = lite.init(jax.random.key(0), src, tgt_bcast)
    ref_flow = lite.apply(params, src, tgt_bcast)
    dedup_flow = lite.apply(params, src, tgt_unique, target_repeat=R)
    np.testing.assert_allclose(np.asarray(dedup_flow),
                               np.asarray(ref_flow), atol=1e-6)

    pwc = PWCNet()
    params = pwc.init(jax.random.key(0), src, tgt_bcast)
    ref_flow = pwc.apply(params, src, tgt_bcast)
    dedup_flow = pwc.apply(params, src, tgt_unique, target_repeat=R)
    np.testing.assert_allclose(np.asarray(dedup_flow),
                               np.asarray(ref_flow), atol=1e-6)


def test_dedup_dbsrnet_forward_unchanged(batch):
    """DBSRNet(flow_net='lite') forward must be unchanged by the encoder's
    reference-frame dedup (same params, same output)."""
    from dbsr_tpu.models.dbsr import AlignedEncoder

    enc = AlignedEncoder(init_dim=8, num_res_blocks=1, out_dim=16,
                         flow_net="lite")
    params = enc.init(jax.random.key(3), batch["burst"])
    out = enc.apply(params, batch["burst"])

    # oracle: the same computation with the reference frame broadcast
    # BEFORE the flow net (the pre-dedup formulation)
    from dbsr_tpu.models.align_lite import AlignLiteNet as _A
    from dbsr_tpu.ops.camera import demosaic_naive
    burst = batch["burst"]
    B, N = burst.shape[:2]
    rgb = demosaic_naive(burst)
    ref = jnp.broadcast_to(rgb[:, :1], (B, N - 1) + rgb.shape[-3:])
    oth = rgb[:, 1:]
    flat = lambda x: x.reshape((-1,) + x.shape[-3:])  # noqa: E731
    flow = _A().apply({"params": params["params"]["alignment_net"]},
                      flat(oth), flat(ref))
    np.testing.assert_allclose(
        np.asarray(out["offsets"]).reshape(flow.shape), np.asarray(flow),
        atol=1e-6)
