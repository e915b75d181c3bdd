"""Serving entry: AOT-compiled predictor from a checkpoint (fixed shape,
partial-batch padding, no recompile per call)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.models.dbsr import dbsrnet_tiny
from dbsr_tpu.serving import load_predictor
from dbsr_tpu.training.checkpoint import save_checkpoint
from dbsr_tpu.training.state import TrainState

CFG = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                  border_crop=4)


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve_ckpt"))
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst = jnp.zeros((1, 3) + CFG.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst)
    state = TrainState.create(params, optax.adam(1e-4))
    return save_checkpoint(d, "tiny", 1, state, net=net)


def test_predictor_shapes_and_padding(ckpt_path):
    pred = load_predictor(ckpt_path, batch_size=4, burst_size=3,
                          burst_hw=CFG.burst_hw, dtype=None)
    assert pred.compile_seconds > 0
    # full batch
    full = np.random.RandomState(0).rand(4, 3, *CFG.burst_hw, 4).astype(
        np.float32)
    out = pred(full)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
    # partial batch pads, returns only n results, equal to full-batch rows
    out2 = pred(full[:2])
    np.testing.assert_allclose(out2, out[:2], atol=1e-6)
    # single burst without batch dim
    out1 = pred(full[0])
    assert out1.shape == (1, 32, 32, 3)


def test_predictor_mesh_sharded(ckpt_path):
    """Multi-chip serving path on the virtual 8-device mesh: host-array
    params/inputs must be placed at the compiled shardings (AOT executables
    do not auto-commit inputs)."""
    from dbsr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pred = load_predictor(ckpt_path, batch_size=8, burst_size=3,
                          burst_hw=CFG.burst_hw, dtype=None, mesh=mesh)
    ref = load_predictor(ckpt_path, batch_size=8, burst_size=3,
                         burst_hw=CFG.burst_hw, dtype=None)
    full = np.random.RandomState(1).rand(8, 3, *CFG.burst_hw, 4).astype(
        np.float32)
    out = pred(full)
    assert out.shape == (8, 32, 32, 3)
    np.testing.assert_allclose(out, ref(full), atol=1e-5)
    # partial batch through the sharded executable
    np.testing.assert_allclose(pred(full[:3]), out[:3], atol=1e-6)
    # batch not divisible by the data axis is rejected at build time
    with pytest.raises(ValueError, match="divisible"):
        load_predictor(ckpt_path, batch_size=3, burst_size=3,
                       burst_hw=CFG.burst_hw, dtype=None, mesh=mesh)


def test_predictor_rejects_bad_shapes(ckpt_path):
    pred = load_predictor(ckpt_path, batch_size=2, burst_size=3,
                          burst_hw=CFG.burst_hw, dtype=None)
    with pytest.raises(ValueError, match="compiled batch"):
        pred(np.zeros((3, 3, *CFG.burst_hw, 4), np.float32))
    with pytest.raises(ValueError, match="frame shape"):
        pred(np.zeros((1, 5, *CFG.burst_hw, 4), np.float32))
