"""PWC pretraining stack: BurstFlowNet contract, flow-label packing and
sign convention, EPE actor, and the pretrained-weight graft into DBSRNet
(zero-egress replacement for the reference's PWC weight download,
``models/dbsr/dbsrnet.py:59-60``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dbsr_tpu.data.procedural import dead_leaves_image
from dbsr_tpu.data.synthetic import BurstConfig, rgb2rawburst
from dbsr_tpu.models.pwcnet import BurstFlowNet
from dbsr_tpu.training.actors import make_flow_actor, pack_flow_to

CFG = BurstConfig(burst_size=3, crop_sz=(64, 64), downsample_factor=2,
                  border_crop=16, max_translation=8.0, max_rotation=0.5,
                  add_noise=False)


@pytest.fixture(scope="module")
def batch():
    img = dead_leaves_image(jax.random.key(5), CFG.pre_crop_sz,
                            num_leaves=80)
    out = jax.jit(lambda k: rgb2rawburst(k, img, CFG))(jax.random.key(7))
    return jax.tree.map(lambda x: x[None], out)  # add batch dim


def test_pack_flow_to_block_average():
    flow = jnp.arange(2 * 3 * 4 * 4 * 2, dtype=jnp.float32).reshape(
        2, 3, 4, 4, 2)
    packed = pack_flow_to(flow, (2, 2))
    assert packed.shape == (2, 3, 2, 2, 2)
    # block (0,0): mean of the 2x2 block, displacement rescaled by /2
    expect = flow[0, 0, :2, :2].mean((0, 1)) / 2.0
    np.testing.assert_allclose(np.asarray(packed[0, 0, 0, 0]),
                               np.asarray(expect), rtol=1e-6)


def test_flow_target_sign_aligns_frames(batch):
    """The actor's supervision target (-flow, packed) must actually warp
    non-reference frames onto the base frame."""
    from dbsr_tpu.ops.camera import demosaic_naive
    from dbsr_tpu.ops.interp import warp

    rgb = demosaic_naive(batch["burst"])[0]            # [N, h, w, 3]
    target = pack_flow_to(-batch["flow"], rgb.shape[1:3])[0]
    ref, oth = rgb[:1], rgb[1:]
    m = 4
    aligned = warp(oth, target[1:])
    err = float(jnp.abs(aligned[:, m:-m, m:-m] - ref[:, m:-m, m:-m]).mean())
    base = float(jnp.abs(oth[:, m:-m, m:-m] - ref[:, m:-m, m:-m]).mean())
    assert err < 0.35 * base, (err, base)


def test_burst_flow_net_shape_and_actor(batch):
    net = BurstFlowNet()
    params = jax.jit(net.init)(jax.random.key(0), batch["burst"])
    flow = jax.jit(net.apply)(params, batch["burst"])
    N = CFG.burst_size
    assert flow.shape == (1, N - 1) + batch["burst"].shape[2:4] + (2,)
    assert flow.dtype == jnp.float32

    actor = make_flow_actor(net)
    (loss, stats), grads = jax.jit(
        jax.value_and_grad(lambda p: actor(p, batch), has_aux=True))(params)
    assert np.isfinite(float(loss))
    assert float(stats["Stat/epe"]) >= 0
    assert 0.0 <= float(stats["Stat/acc_0.5px"]) <= 1.0
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_graft_alignment_params(tmp_path, batch):
    """A BurstFlowNet checkpoint grafts into DBSRNet's
    encoder/alignment_net subtree; other params are untouched; the grafted
    model's flow equals the standalone net's flow."""
    from dbsr_tpu.configs.dbsr.default_synthetic import \
        graft_alignment_params
    from dbsr_tpu.models.dbsr import DBSRNet
    from dbsr_tpu.training.checkpoint import save_checkpoint
    from dbsr_tpu.training.state import TrainState

    flow_net = BurstFlowNet()
    fparams = jax.jit(flow_net.init)(jax.random.key(1), batch["burst"])
    state = TrainState.create(fparams, optax.adam(1e-4))
    ckpt = save_checkpoint(str(tmp_path), "pwcnet_synth", 3, state,
                           net=flow_net)

    net = DBSRNet(enc_init_dim=8, enc_num_res_blocks=1, enc_out_dim=16,
                  dec_init_conv_dim=8, dec_num_pre_res_blocks=1,
                  dec_post_conv_dim=8, dec_num_post_res_blocks=1,
                  upsample_factor=4, offset_feat_dim=4,
                  weight_pred_proj_dim=4, num_weight_predictor_res=1,
                  train_alignment=False)
    dparams = jax.jit(net.init)(jax.random.key(2), batch["burst"])
    grafted = graft_alignment_params(dparams, ckpt)

    got = grafted["params"]["encoder"]["alignment_net"]
    want = fparams["params"]["alignment_net"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got, want)
    # decoder untouched
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        grafted["params"]["decoder"], dparams["params"]["decoder"])

    # grafted DBSR reports the standalone net's flow as its offsets
    _, aux = jax.jit(net.apply)(grafted, batch["burst"])
    flow = jax.jit(flow_net.apply)(fparams, batch["burst"])
    np.testing.assert_allclose(np.asarray(aux["offsets"]),
                               np.asarray(flow), atol=1e-5)


def test_graft_rejects_incompatible(tmp_path, batch):
    from dbsr_tpu.configs.dbsr.default_synthetic import \
        graft_alignment_params
    from dbsr_tpu.models.dbsr import dbsrnet_tiny
    from dbsr_tpu.training.checkpoint import save_checkpoint
    from dbsr_tpu.training.state import TrainState

    flow_net = BurstFlowNet()
    fparams = jax.jit(flow_net.init)(jax.random.key(1), batch["burst"])
    state = TrainState.create(fparams, optax.adam(1e-4))
    ckpt = save_checkpoint(str(tmp_path), "pwcnet_synth", 1, state,
                           net=flow_net)
    # ConvFlow-stub DBSR has a different alignment_net tree
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    dparams = jax.jit(net.init)(jax.random.key(2), batch["burst"])
    with pytest.raises((ValueError, KeyError)):
        graft_alignment_params(dparams, ckpt)


def test_probe_params_artifact_roundtrip(tmp_path, batch):
    """pwc_pretrain_probe's --save/--init_from path: a params-only
    artifact written from one BurstFlowNet roundtrips exactly into a
    freshly initialized one (the curriculum-transfer mechanism)."""
    from flax import serialization

    from dbsr_tpu.training.checkpoint import (load_checkpoint,
                                              save_params_artifact)

    flow_net = BurstFlowNet()
    src = jax.jit(flow_net.init)(jax.random.key(7), batch["burst"])
    path = str(tmp_path / "probe_params.ckpt")
    save_params_artifact(
        path, {"epoch": 5000, "net_name": "pwcnet_probe",
               "settings": {"regime": "bigflow"}}, jax.device_get(src))

    hdr, raw = load_checkpoint(path)
    assert hdr["params_only"] and hdr["settings"]["regime"] == "bigflow"
    fresh = jax.jit(flow_net.init)(jax.random.key(8), batch["burst"])
    restored = serialization.from_state_dict(fresh, raw)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored, src)
