"""Training runtime tests: checkpoint round-trip, schedule, end-to-end tiny
training with loss decrease, fail-safe resume, sharded trainer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dbsr_tpu.data.pipeline import CropBatcher, RandomImageSampler
from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.models.dbsr import dbsrnet_tiny
from dbsr_tpu.training import checkpoint as ckpt
from dbsr_tpu.training.actors import make_synthetic_actor
from dbsr_tpu.training.state import TrainState, make_optimizer, step_lr_schedule
from dbsr_tpu.training.trainer import LoaderSpec, Trainer


class FakeImages:
    """In-memory image dataset standing in for ZurichRAW2RGB."""

    def __init__(self, n=4, hw=(80, 96), seed=0):
        rng = np.random.RandomState(seed)
        self.images = [
            (rng.rand(*hw, 3) * 255).astype(np.uint8) for _ in range(n)]

    def get_num_images(self):
        return len(self.images)

    def get_image(self, i, info=None):
        return self.images[i], {}


TINY_CFG = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                       border_crop=4, max_translation=3.0, max_rotation=0.5)


def _make_trainer(tmp_path, mesh=None, batches_per_epoch=4, seed=0,
                  flow_net="conv"):
    # runtime-plumbing tests use the ConvFlow stub: tracing/compiling the
    # full PWC pyramid costs ~40 s per jitted step on the 1-core CPU
    # backend and the trainer semantics do not depend on the flow net
    net = dbsrnet_tiny(upsample_factor=4, flow_net=flow_net)
    actor = make_synthetic_actor(net, boundary_ignore=4)
    tx = make_optimizer(1e-3, 40, 0.2, steps_per_epoch=batches_per_epoch)
    sampler = RandomImageSampler([FakeImages()], [1.0],
                                 samples_per_epoch=2 * batches_per_epoch)
    batcher = CropBatcher(sampler, batch_size=2,
                          crop_sz=TINY_CFG.pre_crop_sz, seed=seed)
    loaders = [LoaderSpec("train", batcher, training=True)]
    return Trainer(net, actor, tx, loaders, TINY_CFG, str(tmp_path),
                   net_name="tiny", mesh=mesh, print_interval=100, seed=seed)


def test_step_lr_schedule():
    s = step_lr_schedule(1e-4, 40, 0.2, steps_per_epoch=10)
    assert s(0) == pytest.approx(1e-4)
    assert s(399) == pytest.approx(1e-4)      # epoch 39
    assert s(400) == pytest.approx(2e-5)      # epoch 40
    assert s(800) == pytest.approx(4e-6)      # epoch 80


def test_checkpoint_roundtrip(tmp_path):
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst = jnp.zeros((1, 3) + TINY_CFG.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst)
    tx = optax.adam(1e-4)
    state = TrainState.create(params, tx)

    path = ckpt.save_checkpoint(str(tmp_path), "tiny", 7, state, net=net,
                                stats={"train": {"loss": 1.0}})
    assert os.path.basename(path) == "tiny_ep0007.ckpt"
    assert ckpt.resolve_checkpoint(str(tmp_path), "tiny") == path

    header, restored = ckpt.load_checkpoint(path, state)
    assert header["epoch"] == 7
    chex_equal = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: jnp.allclose(a, b), state.params, restored.params))
    assert chex_equal


def test_checkpoint_rebuild_network(tmp_path):
    """Architecture reconstruction from the checkpoint alone (the
    NetConstructor capability)."""
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst = jnp.zeros((1, 3) + TINY_CFG.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst)
    state = TrainState.create(params, optax.adam(1e-4))
    path = ckpt.save_checkpoint(str(tmp_path), "tiny", 1, state, net=net)

    net2, params2, header = ckpt.load_network(path)
    pred1, _ = net.apply(params, burst)
    pred2, _ = net2.apply(params2, burst)
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred2),
                               atol=1e-6)


def test_checkpoint_resolution_by_epoch(tmp_path):
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst = jnp.zeros((1, 3) + TINY_CFG.burst_hw + (4,))
    state = TrainState.create(net.init(jax.random.key(0), burst),
                              optax.adam(1e-4))
    for e in (1, 2, 5):
        ckpt.save_checkpoint(str(tmp_path), "tiny", e, state)
    assert ckpt.resolve_checkpoint(str(tmp_path), "tiny").endswith("0005.ckpt")
    assert ckpt.resolve_checkpoint(str(tmp_path), "tiny", 2).endswith(
        "0002.ckpt")
    with pytest.raises(FileNotFoundError):
        ckpt.resolve_checkpoint(str(tmp_path), "tiny", 3)


def test_training_decreases_loss(tmp_path):
    # full net (real PWC flow): the one end-to-end learning check
    trainer = _make_trainer(tmp_path, batches_per_epoch=8, flow_net="pwc")
    state = trainer.train(3, load_latest=False, fail_safe=False)
    meter = trainer.stats["train"]["Loss/total"]
    first = meter.history[0]  # epoch-1 average (archived at epoch roll)
    final = meter.avg  # last epoch's running average
    assert np.isfinite(first) and np.isfinite(final)
    assert final < first, (first, final)
    # checkpoint written every epoch
    assert ckpt.resolve_checkpoint(str(tmp_path), "tiny").endswith(
        "0003.ckpt")


def test_is_divergent_logic():
    from dbsr_tpu.training.trainer import is_divergent
    assert not is_divergent(0.01, None, 2.0)        # no baseline yet
    assert not is_divergent(0.019, 0.01, 2.0)       # under the factor
    assert is_divergent(0.021, 0.01, 2.0)           # over the factor
    assert is_divergent(float("nan"), None, 2.0)    # non-finite always
    assert is_divergent(float("inf"), 0.01, 2.0)
    assert not is_divergent(0.5, 0.01, None)        # disabled
    assert not is_divergent(None, 0.01, 2.0)        # no loss stat


def test_divergence_rollback(tmp_path):
    """An epoch whose train loss blows up is not checkpointed: training
    rolls back to the last good checkpoint, retries on a reseeded
    stream, and completes. Scripted losses: ep1 good, ep2 diverged
    (50x), ep2-retry good, ep3 good."""
    trainer = _make_trainer(tmp_path)
    losses = iter([0.01, 0.5, 0.011, 0.012])
    salts = []

    def fake_cycle(state, loader):
        stats = trainer.stats[loader.name]
        stats.new_epoch()
        stats.update_from({"Loss/total": next(losses)}, n=2)
        salts.append(trainer._retry_salt)
        return state

    trainer._cycle = fake_cycle
    trainer.train(3, load_latest=False)
    # the diverged epoch-2 attempt was rolled back and retried
    assert trainer._retry_salt == 1
    assert salts == [0, 0, 1, 1]  # retry + epoch 3 use the new stream
    ckpts = ckpt.list_checkpoints(str(tmp_path), "tiny")
    assert [e for e, _ in ckpts] == [1, 2, 3]


def test_divergence_budget_exhaustion(tmp_path):
    """Persistent divergence consumes the failure budget and raises."""
    trainer = _make_trainer(tmp_path)
    seq = iter([0.01] + [1.0] * 10)

    def fake_cycle(state, loader):
        stats = trainer.stats[loader.name]
        stats.new_epoch()
        stats.update_from({"Loss/total": next(seq)}, n=2)
        return state

    trainer._cycle = fake_cycle
    with pytest.raises(RuntimeError, match="diverged"):
        trainer.train(3, load_latest=False, max_failures=2)


def test_make_optimizer_clip_norm():
    """clip_norm bounds the update magnitude under a gradient spike."""
    import optax
    params = {"w": jnp.zeros((4,))}
    huge = {"w": jnp.full((4,), 1e6)}
    for clip, bound in ((1.0, True), (None, False)):
        tx = make_optimizer(1e-4, 40, 0.2, steps_per_epoch=10,
                            clip_norm=clip)
        st = tx.init(params)
        upd, _ = tx.update(huge, st, params)
        # Adam normalizes by |g| so the first-step update is ~lr either
        # way; check the clip actually transformed the gradient by
        # inspecting the chained state structure instead.
        assert np.all(np.isfinite(np.asarray(upd["w"])))
        is_chained = isinstance(st, tuple) and len(st) == 2 and \
            isinstance(st[0], optax.EmptyState)
        assert is_chained == bound


def test_training_resume(tmp_path):
    t1 = _make_trainer(tmp_path)
    t1.train(2, load_latest=False, fail_safe=False)
    t2 = _make_trainer(tmp_path)
    t2.train(3, load_latest=True, fail_safe=False)
    assert t2.epoch == 3
    ckpts = ckpt.list_checkpoints(str(tmp_path), "tiny")
    assert [e for e, _ in ckpts] == [1, 2, 3]


def test_trainer_with_mesh(tmp_path):
    from dbsr_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    net = dbsrnet_tiny(upsample_factor=4)
    actor = make_synthetic_actor(net, boundary_ignore=4)
    tx = make_optimizer(1e-3, 40, 0.2, steps_per_epoch=2)
    sampler = RandomImageSampler([FakeImages()], [1.0], samples_per_epoch=16)
    batcher = CropBatcher(sampler, batch_size=8,
                          crop_sz=TINY_CFG.pre_crop_sz)
    trainer = Trainer(net, actor, tx, [LoaderSpec("train", batcher)],
                      TINY_CFG, str(tmp_path), net_name="tiny_dp", mesh=mesh,
                      print_interval=100)
    state = trainer.train(1, load_latest=False, fail_safe=False)
    assert np.isfinite(trainer.stats["train"]["Loss/total"].avg)


def test_val_loader_epoch_interval(tmp_path):
    net = dbsrnet_tiny(upsample_factor=4)
    actor = make_synthetic_actor(net, boundary_ignore=4)
    tx = make_optimizer(1e-3, 40, 0.2, steps_per_epoch=2)
    mk = lambda seed: CropBatcher(
        RandomImageSampler([FakeImages()], [1.0], samples_per_epoch=4),
        batch_size=2, crop_sz=TINY_CFG.pre_crop_sz, seed=seed)
    loaders = [LoaderSpec("train", mk(0), training=True),
               LoaderSpec("val", mk(1), training=False, epoch_interval=2)]
    trainer = Trainer(net, actor, tx, loaders, TINY_CFG, str(tmp_path),
                      net_name="tiny_v", print_interval=100)
    trainer.train(2, load_latest=False, fail_safe=False)
    assert trainer.stats["val"]["Stat/psnr"].count > 0


def test_checkpoint_roundtrip_with_dtype(tmp_path):
    """dtype fields (jnp.bfloat16) survive the JSON network spec."""
    net = dbsrnet_tiny(upsample_factor=4, dtype=jnp.bfloat16,
                       flow_net="conv")
    burst = jnp.zeros((1, 3) + TINY_CFG.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst)
    state = TrainState.create(params, optax.adam(1e-4))
    path = ckpt.save_checkpoint(str(tmp_path), "tiny_bf16", 1, state,
                                net=net)
    net2, params2, _ = ckpt.load_network(path)
    assert net2.dtype == jnp.bfloat16
    p1, _ = net.apply(params, burst)
    p2, _ = net2.apply(params2, burst)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_memoized_put_identity_cache():
    """_memoized_put re-places only when the source array changes —
    epoch-constant pool handles must not be re-distributed per step."""
    from dbsr_tpu.training.trainer import _memoized_put

    calls = []

    def put(b):
        calls.append(b)
        return b * 2

    mput = _memoized_put(put)
    a = jnp.arange(4.0)  # device arrays (the pool-handle case) memoize
    out1 = mput(a)
    out2 = mput(a)
    assert out2 is out1 and len(calls) == 1
    b = jnp.arange(4.0)
    mput(b)
    assert len(calls) == 2
    # host arrays (mutable in place) are never cached — every call
    # re-places
    d = np.zeros(2)
    mput(d)
    mput(d)
    assert len(calls) == 4


def test_cli_main_smoke_tiny(tmp_path, monkeypatch):
    """Drive the actual training CLI (argparse -> --set overrides ->
    config run -> checkpoint) end to end, including batch_size passed
    BOTH as a flag and via --set — a duplicate-keyword crash shipped
    until this path was covered."""
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.syspath_prepend(repo)
    env_path = tmp_path / "env.json"
    env_path.write_text(json.dumps({"workspace_dir": str(tmp_path)}))
    monkeypatch.setenv("DBSR_TPU_ENV", str(env_path))
    import run_training as cli
    monkeypatch.setattr(sys, "argv", [
        "run_training.py", "dbsr", "smoke_tiny",
        "--batch_size", "2", "--single_device",
        "--set", "batch_size=2", "--set", "multi_device=True"])
    cli.main()
    ckpts = list((tmp_path / "dbsr" / "smoke_tiny").glob("*.ckpt"))
    assert ckpts, "no checkpoint written by the smoke run"


def test_params_only_artifact_roundtrip_and_resume_guard(tmp_path):
    """save_params_artifact keeps the params subtree loadable (graft/eval
    path) but load_checkpoint with a state template must refuse it —
    params-only artifacts are reset-proof graft material, not resume
    points (round 3: a VM reset cost the campaign workspace)."""
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst = jnp.zeros((1, 3) + TINY_CFG.burst_hw + (4,))
    state = TrainState.create(net.init(jax.random.key(0), burst),
                              optax.adam(1e-4))
    src = ckpt.save_checkpoint(str(tmp_path), "tiny", 7, state, net=net)
    header, raw = ckpt.load_checkpoint(src)

    art = ckpt.save_params_artifact(
        str(tmp_path / "tiny_params.ckpt"), header,
        {"params": raw["params"]})
    aheader, araw = ckpt.load_checkpoint(art)
    assert aheader["params_only"] and aheader["epoch"] == 7
    assert "net_spec" in aheader
    got = jax.tree_util.tree_leaves(araw["params"])
    want = jax.tree_util.tree_leaves(raw["params"])
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    # artifact is much smaller than the full checkpoint (no Adam moments)
    assert os.path.getsize(art) < 0.55 * os.path.getsize(src)

    with pytest.raises(ValueError, match="params-only"):
        ckpt.load_checkpoint(art, state)


def test_params_only_resume_grafts_and_fast_forwards(tmp_path, capsys):
    """A params-only artifact DROPPED INTO the workspace (the campaign's
    post-VM-reset seeding path) resumes training: params grafted at the
    artifact's epoch, optimizer state fresh, step counter fast-forwarded
    so the step-indexed LR schedule lands on the right rung."""
    ws1 = tmp_path / "run1"
    ws1.mkdir()
    t1 = _make_trainer(ws1)
    t1.train(2, load_latest=False, fail_safe=False)
    src = ckpt.resolve_checkpoint(str(ws1), "tiny", 2)
    header, raw = ckpt.load_checkpoint(src)

    ws2 = tmp_path / "run2"  # "wiped" workspace, reseeded from the bank
    ws2.mkdir()
    art = ckpt.save_params_artifact(
        str(ws2 / "tiny_ep0002.ckpt"), header, {"params": raw["params"]})

    t2 = _make_trainer(ws2)
    state0 = t2.init_state()
    state = t2._load_latest(state0)
    assert t2.epoch == 2
    # params match the artifact exactly
    got = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params))
    want = jax.tree_util.tree_leaves(raw["params"])
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # step fast-forwarded: 2 epochs x 4 batches/epoch
    assert int(state.step) == 8
    out = capsys.readouterr().out
    assert "PARAMS-ONLY" in out
    # and training continues from there to the target epoch
    t2.train(3, load_latest=True, fail_safe=False)
    assert t2.epoch == 3
    assert ckpt.resolve_checkpoint(str(ws2), "tiny", 3) is not None
    assert art  # artifact path used above


def test_mid_epoch_divergence_aborts_cycle(tmp_path):
    """A print-interval whose mean loss blows past the intra-epoch guard
    aborts the cycle from inside the real _cycle/flush path (and the
    finally-close releases the prefetch thread)."""
    from dbsr_tpu.training.trainer import MidEpochDivergence
    trainer = _make_trainer(tmp_path)
    trainer.print_interval = 1
    # any real interval loss exceeds 3x this "best epoch"
    trainer._best_train_loss = 1e-9
    state = trainer.init_state()
    trainer.epoch = 2
    with pytest.raises(MidEpochDivergence):
        trainer._cycle(state, trainer.loaders[0])


def test_mid_epoch_divergence_rollback(tmp_path):
    """train() treats MidEpochDivergence like epoch-level divergence:
    roll back to the last good checkpoint on a reseeded stream instead
    of the generic crash-restart (which would replay the same stream)."""
    from dbsr_tpu.training.trainer import MidEpochDivergence
    trainer = _make_trainer(tmp_path)
    losses = iter([0.01, None, 0.011, 0.012])  # None => mid-epoch abort
    salts = []

    def fake_cycle(state, loader):
        stats = trainer.stats[loader.name]
        stats.new_epoch()
        salts.append(trainer._retry_salt)
        val = next(losses)
        if val is None:
            raise MidEpochDivergence(0.5, trainer._best_train_loss, 700)
        stats.update_from({"Loss/total": val}, n=2)
        return state

    trainer._cycle = fake_cycle
    trainer.train(3, load_latest=False)
    assert trainer._retry_salt == 1
    assert salts == [0, 0, 1, 1]
    ckpts = ckpt.list_checkpoints(str(tmp_path), "tiny")
    assert [e for e, _ in ckpts] == [1, 2, 3]


def test_best_train_loss_tracks_epoch_minimum(tmp_path):
    """The intra-epoch guard's baseline (self._best_train_loss) is kept
    in sync with the epoch loop's best — a regression test for the guard
    reading a field the loop never wrote."""
    trainer = _make_trainer(tmp_path)
    # stay under the 1.4x epoch divergence factor between epochs
    losses = iter([0.012, 0.01, 0.011])

    def fake_cycle(state, loader):
        stats = trainer.stats[loader.name]
        stats.new_epoch()
        stats.update_from({"Loss/total": next(losses)}, n=2)
        return state

    trainer._cycle = fake_cycle
    trainer.train(3, load_latest=False)
    assert trainer._best_train_loss == pytest.approx(0.01)


def test_async_checkpoint_writer_orders_and_flushes(tmp_path):
    import time as _time
    w = ckpt.AsyncCheckpointWriter()
    order = []

    def slow(i):
        def fn():
            _time.sleep(0.05)
            order.append(i)
            (tmp_path / f"f{i}").write_text("x")
        return fn

    for i in range(3):
        w.submit(slow(i))
    w.flush()
    assert order == [0, 1, 2]
    assert all((tmp_path / f"f{i}").exists() for i in range(3))
    w.close()


def test_async_checkpoint_writer_surfaces_errors():
    import pytest as _pytest
    w = ckpt.AsyncCheckpointWriter()
    w.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
    with _pytest.raises(RuntimeError, match="async checkpoint write"):
        w.flush()
    # the writer stays usable after an error was surfaced
    w.submit(lambda: None)
    w.close()


def test_trainer_async_save_lands_before_resume(tmp_path):
    """The trainer's checkpoint READ paths flush pending async writes:
    a resume immediately after train() (and a rollback's _load_latest)
    must see every epoch on disk."""
    t1 = _make_trainer(tmp_path)
    losses = iter([0.01, 0.011])

    def fake_cycle(state, loader):
        stats = t1.stats[loader.name]
        stats.new_epoch()
        stats.update_from({"Loss/total": next(losses)}, n=2)
        return state

    t1._cycle = fake_cycle
    t1._ckpt_writer = ckpt.AsyncCheckpointWriter()  # opt-in
    t1.train(2, load_latest=False)
    ckpts = ckpt.list_checkpoints(str(tmp_path), "tiny")
    assert [e for e, _ in ckpts] == [1, 2]


def test_masked_adam_drops_frozen_moments(tmp_path):
    """freeze_subtree masks Adam off the frozen aligner: its moment
    arrays vanish from opt_state (smaller checkpoints), updates leave
    the frozen params untouched, and the masked state round-trips
    through the checkpoint container."""
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst = jnp.zeros((1, 3) + TINY_CFG.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst)

    def n_moment_leaves(tx):
        st = TrainState.create(params, tx)
        return len(jax.tree_util.tree_leaves(st.opt_state)), st

    full_n, _ = n_moment_leaves(make_optimizer(1e-3, 40, 0.2,
                                               steps_per_epoch=4))
    masked_n, st = n_moment_leaves(make_optimizer(
        1e-3, 40, 0.2, steps_per_epoch=4, freeze_subtree="alignment_net"))
    assert masked_n < full_n

    # an update with nonzero grads everywhere must not move frozen params
    tx = make_optimizer(1e-3, 40, 0.2, steps_per_epoch=4,
                        freeze_subtree="alignment_net")
    grads = jax.tree.map(jnp.ones_like, params)
    updates, new_opt = tx.update(grads, st.opt_state, st.params)
    st2 = st.replace(params=optax.apply_updates(st.params, updates),
                     opt_state=new_opt, step=st.step + 1)
    before = params["params"]["encoder"]["alignment_net"]
    after = st2.params["params"]["encoder"]["alignment_net"]
    assert jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), before, after))
    moved = st2.params["params"]["decoder"]
    assert not jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        params["params"]["decoder"], moved))

    # checkpoint round-trip with a matching masked template
    path = ckpt.save_checkpoint(str(tmp_path), "tiny", 1, st2, net=net)
    _, restored = ckpt.load_checkpoint(path, st)
    assert jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b)),
        st2.params, restored.params))


def test_masked_adam_auto_default(tmp_path):
    """Fresh frozen-flow runs default to masked Adam; resumes rebuild
    whatever structure the latest checkpoint was written with — via the
    recorded header flag, or an opt_state structure sniff for legacy
    checkpoints that predate it."""
    from dbsr_tpu.training.state import default_masked_adam

    params = {"encoder": {"alignment_net": {"w": jnp.ones((3,))},
                          "embed": {"w": jnp.ones((3,))}}}

    def write(dirname, masked, epoch=1, settings=None):
        tx = make_optimizer(
            1e-4, 40, 0.2, steps_per_epoch=4,
            freeze_subtree="alignment_net" if masked else None)
        st = TrainState.create(params, tx)
        d = str(tmp_path / dirname)
        return ckpt.save_checkpoint(d, "dbsr_synthetic", epoch, st,
                                    settings=settings), d

    # explicit always wins
    assert default_masked_adam(str(tmp_path / "none"), "dbsr_synthetic",
                               frozen=True, explicit=False) is False
    assert default_masked_adam(str(tmp_path / "none"), "dbsr_synthetic",
                               frozen=False, explicit=True) is True
    # fresh: masked iff frozen
    assert default_masked_adam(str(tmp_path / "none"), "dbsr_synthetic",
                               frozen=True) is True
    assert default_masked_adam(str(tmp_path / "none"), "dbsr_synthetic",
                               frozen=False) is False

    # legacy checkpoints (no header flag): structure sniff decides
    path_u, dir_u = write("legacy_unmasked", masked=False)
    assert ckpt.opt_state_is_masked(path_u) is False
    assert default_masked_adam(dir_u, "dbsr_synthetic", frozen=True) is False
    path_m, dir_m = write("legacy_masked", masked=True)
    assert ckpt.opt_state_is_masked(path_m) is True
    assert default_masked_adam(dir_m, "dbsr_synthetic", frozen=True) is True

    # recorded header flag wins without a sniff
    _, dir_r = write("recorded", masked=False,
                     settings={"masked_adam": False})
    assert default_masked_adam(dir_r, "dbsr_synthetic", frozen=True) is False

    # header-only read round-trips the flag cheaply
    path_r, _ = write("hdr", masked=True, epoch=2,
                      settings={"masked_adam": True})
    hdr = ckpt.read_header(path_r)
    assert hdr["epoch"] == 2 and hdr["settings"]["masked_adam"] is True


def test_masked_adam_cross_restore_diagnostic(tmp_path):
    """Resuming a masked-checkpoint workspace with a TRAINABLE aligner
    must fail with a clear diagnostic up front, not an opaque flax
    structure mismatch at restore time (ADVICE r3)."""
    import pytest

    from dbsr_tpu.training.state import default_masked_adam

    params = {"encoder": {"alignment_net": {"w": jnp.ones((3,))},
                          "embed": {"w": jnp.ones((3,))}}}
    tx = make_optimizer(1e-4, 40, 0.2, steps_per_epoch=4,
                        freeze_subtree="alignment_net")
    st = TrainState.create(params, tx)
    d = str(tmp_path / "ws")
    ckpt.save_checkpoint(d, "dbsr_synthetic", 1, st,
                         settings={"masked_adam": True})
    with pytest.raises(ValueError, match="cross-restore"):
        default_masked_adam(d, "dbsr_synthetic", frozen=False)
    # explicit override still wins (the caller takes responsibility)
    assert default_masked_adam(d, "dbsr_synthetic", frozen=False,
                               explicit=False) is False
