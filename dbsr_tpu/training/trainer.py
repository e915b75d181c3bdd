"""Trainer: jitted train/eval steps with on-device synthesis, epoch loop
with fail-safe restart, checkpoint/resume, stats and TensorBoard logging.

Re-design of reference ``trainers/{base_trainer,simple_trainer}.py``:

  * the per-batch work (burst synthesis -> forward -> loss -> backward ->
    Adam update) is ONE jitted function; the host loop only feeds RGB crop
    batches and accumulates scalar stats (reference splits this across
    dataloader workers + a Python train loop);
  * fail-safe: a crashed epoch reloads the latest checkpoint and retries,
    up to ``max_failures`` times (reference ``base_trainer.py:59-85``);
  * checkpoints are atomic per-epoch files with architecture spec embedded
    (``dbsr_tpu/training/checkpoint.py``), resume = load latest
    (reference ``base_trainer.py:92-201``);
  * validation loaders run every ``epoch_interval`` epochs with a loss-only
    step (reference ``simple_trainer.py:58-66``);
  * optional ``jax.sharding.Mesh``: batch sharded over the ``data`` axis,
    params replicated, XLA all-reduces gradients over ICI (replacing
    ``admin/multigpu.py``'s DataParallel).
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dbsr_tpu.data.synthetic import BurstConfig, synthesize_batch
from dbsr_tpu.parallel.mesh import data_sharding, replicated_sharding
from dbsr_tpu.training import checkpoint as ckpt
from dbsr_tpu.training.state import TrainState
from dbsr_tpu.training.stats import StatsDict
from dbsr_tpu.training.tblogger import TensorboardWriter


def _memoized_put(put_fn):
    """Wrap a device-placement fn with a last-input identity cache.

    Loaders that yield the SAME device array every step (e.g.
    ``ProceduralPoolBatcher``'s epoch-constant pool handle) would
    otherwise be re-distributed to the mesh sharding on every step —
    ~1.2 GB/step for the default pool. Only immutable ``jax.Array``
    inputs are cached: host arrays could be mutated in place by a
    buffer-reusing batcher, which an id() cache cannot detect. A weakref
    guards against id() reuse after the source array is freed."""
    import weakref

    cache = {}

    def put(b):
        ref = cache.get("src")
        if ref is not None and ref() is b:
            return cache["out"]
        out = put_fn(b)
        if isinstance(b, jax.Array):
            cache["src"] = weakref.ref(b)
            cache["out"] = out
        else:
            cache.clear()
        return out

    return put


def is_divergent(loss_avg: Optional[float], best: Optional[float],
                 factor: Optional[float]) -> bool:
    """Epoch-level divergence decision: non-finite loss always counts;
    otherwise the epoch average must exceed ``factor`` x the best epoch
    seen. ``factor=None`` disables; no verdict before a best exists
    (the first epochs establish the baseline)."""
    if factor is None or loss_avg is None:
        return False
    if not np.isfinite(loss_avg):
        return True
    return best is not None and loss_avg > factor * best


class MidEpochDivergence(RuntimeError):
    """Raised from inside a training cycle when one print-interval's
    average loss blows past the intra-epoch guard. The train loop treats
    it like epoch-level divergence — roll back to the last good
    checkpoint on a reseeded stream — but without finishing (or paying
    for) the rest of the already-doomed epoch. Observed live in round 3:
    a bf16 optimizer blow-up pinned the loss at ~6x best for the final
    600 steps of an epoch before the epoch-level guard could see it."""

    def __init__(self, interval_avg: float, best: Optional[float],
                 step: int):
        super().__init__(
            f"interval loss {interval_avg:.6g} at step {step} vs best "
            f"epoch {best if best is None else format(best, '.6g')}")
        self.interval_avg = interval_avg
        self.best = best
        self.step = step


@dataclass
class LoaderSpec:
    """One data loader: a host batcher + schedule metadata (reference
    ``data/loader.py:19-60`` attributes name/training/epoch_interval)."""
    name: str
    batcher: object          # CropBatcher-like: next_batch() -> np [B,H,W,3]
    training: bool = True
    epoch_interval: int = 1

    def num_batches(self) -> int:
        return len(self.batcher)


class Trainer:
    def __init__(self, net, actor_fn: Callable, tx, loaders: List[LoaderSpec],
                 burst_cfg: BurstConfig, workspace_dir: str,
                 net_name: str = "dbsr", tensorboard_dir: Optional[str] = None,
                 mesh=None, print_interval: int = 50, seed: int = 0,
                 description: str = "", prepare_fn: Optional[Callable] = None,
                 init_burst_shape: Optional[tuple] = None,
                 cast_uint8_inputs: bool = True,
                 divergence_factor: Optional[float] = 1.4,
                 intra_divergence_factor: Optional[float] = 3.0,
                 async_checkpoint: bool = False,
                 header_settings: Optional[dict] = None):
        """``prepare_fn(key, host_batch) -> batch dict`` maps the host
        loader's output to the training batch on device. Default: on-device
        burst synthesis from RGB crops (``synthesize_batch`` with
        ``burst_cfg``). Pass an identity-like fn for pre-formed batches
        (e.g. BurstSR real bursts). ``cast_uint8_inputs`` up-casts uint8
        loader outputs to f32/255 before ``prepare_fn``; disable it when the
        loader yields something other than image crops (e.g. the
        ``ProceduralPoolBatcher``'s uint8 pool handle, whose batch draw and
        cast happen inside ``prepare_fn``)."""
        self.net = net
        self.actor_fn = actor_fn
        self.tx = tx
        self.loaders = loaders
        if jax.process_count() > 1:
            # Multi-host: every process runs this constructor with the same
            # config seed; without decorrelation each process's batcher
            # would produce IDENTICAL crops and global_batch_from_local
            # would assemble process_count copies of the same data. Fold the
            # process index into every batcher's stream. (The configured
            # batch_size is per-process; the global batch is
            # batch_size * process_count.)
            pid = jax.process_index()
            for l in loaders:
                fold = getattr(l.batcher, "fold_in_process", None)
                if fold is not None:
                    fold(pid)
                else:
                    print(f"WARNING: loader '{l.name}' batcher has no "
                          "fold_in_process(); multi-host processes may feed "
                          "duplicate data", flush=True)
        self.cfg = burst_cfg
        self.prepare_fn = prepare_fn
        self.cast_uint8_inputs = cast_uint8_inputs
        self.init_burst_shape = init_burst_shape
        self.workspace_dir = workspace_dir
        self.net_name = net_name
        # run metadata embedded in every checkpoint header (e.g.
        # masked_adam, so resumes rebuild a matching opt_state structure)
        self.header_settings = dict(header_settings or {})
        self.mesh = mesh
        self.print_interval = print_interval
        self.epoch = 0
        self.seed = seed
        # Divergence guard: an epoch whose train-loss average exceeds
        # divergence_factor x the best epoch so far (or is non-finite) is
        # NOT checkpointed; training rolls back to the last good
        # checkpoint with a reseeded data stream. Catches optimizer
        # blow-ups that a crash-only fail-safe misses — observed live in
        # round 3: a bf16 loss spike mid-epoch collapsed the decoder's
        # final-ReLU output to all-zeros (loss pinned at mean|gt|, zero
        # gradient, no recovery) and the stuck run kept checkpointing.
        # None disables. Default 1.4: the round-3 campaign's lasting
        # damage came through an epoch at 1.48x best (under the earlier
        # 2.0 factor), while healthy epoch-to-epoch variation in the
        # same run stayed within +-2% of best — 1.4 separates the two
        # regimes with a wide margin, and a false positive only costs
        # one retried epoch on a reseeded stream.
        self.divergence_factor = divergence_factor
        # Intra-epoch guard: a print-interval whose mean loss exceeds
        # intra_divergence_factor x the best EPOCH average aborts the
        # cycle immediately (MidEpochDivergence -> rollback). Interval
        # means are noisier than epoch means, hence the looser factor.
        self.intra_divergence_factor = intra_divergence_factor
        # async_checkpoint overlaps checkpoint writes with the next
        # epoch's training. Default OFF after a live negative result on
        # the relayed runtime: a background 156 MB state fetch that takes
        # ~25 s exclusively took ~6 MINUTES concurrent with training
        # dispatch (the relay starves device->host transfers behind the
        # execution stream), so the writer backlog throttled epochs to
        # ~4 min — worse than paying the save synchronously. Enable on
        # runtimes with fair transfer scheduling. Every checkpoint READ
        # path flushes first; see AsyncCheckpointWriter.
        self._ckpt_writer = ckpt.AsyncCheckpointWriter() \
            if async_checkpoint else None
        self._best_train_loss: Optional[float] = None
        self._retry_salt = 0
        self.stats: Dict[str, StatsDict] = {
            l.name: StatsDict() for l in loaders}
        self.tb = TensorboardWriter(
            tensorboard_dir, [l.name for l in loaders]) \
            if tensorboard_dir else None
        if self.tb:
            self.tb.write_info(net_name, description)

        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg = self.cfg
        tx = self.tx
        actor = self.actor_fn
        prepare = self.prepare_fn or (
            lambda key, crops: synthesize_batch(key, crops, cfg))

        def _as_float(crops):
            """Crops arrive as uint8 by default (CropBatcher
            transfer_dtype): 4x fewer host->device bytes, normalized back
            to [0, 1] f32 on device."""
            if not self.cast_uint8_inputs:
                return crops
            if jax.tree_util.tree_leaves(crops)[0].dtype == jnp.uint8:
                return jax.tree.map(
                    lambda x: x.astype(jnp.float32) / 255.0, crops)
            return crops

        def train_step(state: TrainState, key, crops):
            batch = prepare(key, _as_float(crops))

            def loss_fn(p):
                return actor(p, batch)

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state)
            return new_state, stats

        def eval_step(state: TrainState, key, crops):
            batch = prepare(key, _as_float(crops))
            _, stats = actor(state.params, batch)
            return stats

        if self.mesh is not None:
            ds = data_sharding(self.mesh)
            rs = replicated_sharding(self.mesh)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rs, None, ds),
                out_shardings=(rs, None))
            self._eval_step = jax.jit(
                eval_step, in_shardings=(rs, None, ds))
            if jax.process_count() > 1:
                # multi-host: each process feeds only its local slice of
                # the global batch (dbsr_tpu/parallel/multihost.py)
                from dbsr_tpu.parallel.multihost import \
                    global_batch_from_local
                mesh = self.mesh
                self._device_put = _memoized_put(
                    lambda b: global_batch_from_local(mesh, b))
            else:
                self._device_put = _memoized_put(
                    lambda b: jax.device_put(b, ds))
        else:
            self._train_step = jax.jit(train_step)
            self._eval_step = jax.jit(eval_step)
            self._device_put = jax.device_put

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        burst_shape = self.init_burst_shape or (
            (1, self.cfg.burst_size) + self.cfg.burst_hw + (4,))
        # On remote/TPU backends, EAGER flax init is hundreds of
        # individual op dispatches through the relay (~3 min of a 6-min
        # chunk startup, measured); one jitted init is a single cached
        # executable (~1 s retrieval with the persistent compile cache).
        # CPU stays eager: there the jit compile itself would be the
        # slow part (test suites build many tiny nets per process).
        init = self.net.init if jax.default_backend() == "cpu" \
            else jax.jit(self.net.init)
        params = init(jax.random.key(self.seed), jnp.zeros(burst_shape))
        state = TrainState.create(params, self.tx)
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state

    # ------------------------------------------------------------------
    def _cycle(self, state: TrainState, loader: LoaderSpec):
        """One pass over a loader (reference
        ``simple_trainer.py:58-89``)."""
        stats = self.stats[loader.name]
        stats.new_epoch()
        n = loader.num_batches()
        key = jax.random.fold_in(
            jax.random.key(self.seed + 1), self.epoch * 131 +
            (0 if loader.training else 1)
            # after a divergence rollback the epoch is retried on a
            # DIFFERENT stream — replaying the identical batch sequence
            # into the restored state could reproduce the blow-up
            + 1_000_003 * self._retry_salt)

        from dbsr_tpu.data.pipeline import DevicePrefetcher
        from dbsr_tpu.training.profiling import maybe_trace
        prefetch = DevicePrefetcher(loader.batcher.next_batch, n,
                                    self._device_put)
        t0 = time.perf_counter()
        samples_done = 0
        # Per-step stat scalars stay ON DEVICE; fetching them every step
        # (float(v)) would block the host until the step completes and
        # serialize the pipeline — a device round-trip per step, costly
        # over remote runtimes. Buffer and fetch in one transfer at
        # print_interval / epoch boundaries instead.
        pending: List[tuple] = []

        def flush(step: int):
            if not pending:
                return
            host = jax.device_get([s for s, _ in pending])
            loss_key = None
            loss_sum = loss_n = 0.0
            for s_host, (_, b) in zip(host, pending):
                vals = {k2: float(v) for k2, v in s_host.items()}
                stats.update_from(vals, n=b)
                if loss_key is None:
                    for cand in ("Loss/total", *sorted(vals)):
                        if cand in vals and cand.startswith("Loss"):
                            loss_key = cand
                            break
                if loss_key in vals:
                    loss_sum += vals[loss_key] * b
                    loss_n += b
            pending.clear()
            # Intra-epoch guard: this interval's mean loss vs the best
            # epoch so far (no verdict until a best exists).
            if loader.training and loss_n:
                interval_avg = loss_sum / loss_n
                if is_divergent(interval_avg, self._best_train_loss,
                                self.intra_divergence_factor):
                    raise MidEpochDivergence(
                        interval_avg, self._best_train_loss, step)

        try:
            for i, crops in enumerate(prefetch):
                k = jax.random.fold_in(key, i)
                with maybe_trace(i):
                    if loader.training:
                        state, step_stats = self._train_step(state, k,
                                                             crops)
                    else:
                        step_stats = self._eval_step(state, k, crops)
                # Pool-handle loaders yield the whole HBM pool, not a
                # batch — count the configured batch size, not the
                # handle's leading dim (which inflated FPS by
                # pool_size/batch_size).
                bs = getattr(loader.batcher, "batch_size", None) \
                    or jax.tree_util.tree_leaves(crops)[0].shape[0]
                samples_done += bs
                pending.append((step_stats, bs))
                if (i + 1) % self.print_interval == 0 or (i + 1) == n:
                    flush(i + 1)
                    # NOTE: on remote runtimes that pipeline execution
                    # behind dispatch, this reflects dispatch+stat-fetch
                    # rate, which can run ahead of device execution; epoch
                    # wall time (checkpoint cadence) is the authoritative
                    # throughput.
                    fps = samples_done / (time.perf_counter() - t0)
                    line = f"[{loader.name}: {self.epoch}, {i + 1}/{n}] " \
                           f"FPS: {fps:.1f}, " + ", ".join(
                               f"{k2}: {m.avg:.5f}" for k2, m in
                               stats.items())
                    print(line, flush=True)
            flush(n)
        finally:
            # Abandoning the iterator (divergence abort / crash) must
            # release the feeder thread, or the retry epoch's new
            # prefetcher races it for the shared batcher.
            prefetch.close()
        return state

    def _train_loss_avg(self) -> Optional[float]:
        """This epoch's average primary loss over the training loaders
        that ran (``Loss/total`` preferred, any ``Loss/*`` fallback)."""
        for loader in self.loaders:
            if not loader.training or self.epoch % loader.epoch_interval:
                continue
            avgs = self.stats[loader.name].averages()
            for key in ("Loss/total", *sorted(avgs)):
                if key in avgs and key.startswith("Loss"):
                    return float(avgs[key])
        return None

    def _save(self, state: TrainState):
        # snapshot mutable inputs NOW; the state pytree itself is
        # immutable jax arrays (and never donated), so a deferred fetch
        # reads the epoch-end values
        stats = {name: s.averages() for name, s in self.stats.items()}
        epoch = self.epoch

        def write():
            ckpt.save_checkpoint(self.workspace_dir, self.net_name, epoch,
                                 state, net=self.net, stats=stats,
                                 settings=self.header_settings)

        if self._ckpt_writer is not None:
            self._ckpt_writer.submit(write)
        else:
            write()

    def _load_latest(self, state: TrainState) -> TrainState:
        if self._ckpt_writer is not None:
            # never resolve a half-landed epoch; a pending WRITE error is
            # logged, not raised — this runs inside the fail-safe retry
            # handlers, and the rollback is correct either way (it just
            # resumes from the last epoch that did land)
            self._ckpt_writer.flush(raise_on_error=False)
        path = ckpt.resolve_checkpoint(self.workspace_dir, self.net_name)
        if path is None:
            return state
        if ckpt.read_header(path).get("params_only"):
            return self._resume_params_only(path, state)
        header, state = ckpt.load_checkpoint(path, state)
        self.epoch = header["epoch"]
        print(f"resumed from {path} (epoch {self.epoch})", flush=True)
        return state

    def _resume_params_only(self, path: str, state: TrainState) -> TrainState:
        """Reset-recovery resume from a PARAMS-ONLY artifact dropped into
        the workspace (a git-banked campaign best seeded back after a VM
        reset wiped the full checkpoints — round 4 lost 60 epochs to
        exactly that). Params are grafted at their recorded epoch; the
        optimizer state is FRESH (the artifact carries none — Adam's
        moments re-accumulate within a few hundred steps) and the
        step counter is fast-forwarded so the step-indexed LR schedule
        (``step_lr_schedule``) resumes at the right rung, mirroring the
        reference's ``lr_scheduler.last_epoch`` sync on resume
        (``trainers/base_trainer.py:181-199``)."""
        from flax import serialization
        header, raw = ckpt.load_checkpoint(path)
        params = serialization.from_state_dict(state.params, raw["params"])
        self.epoch = int(header["epoch"])
        steps_per_epoch = max(
            (l.num_batches() for l in self.loaders if l.training), default=0)
        state = state.replace(
            params=params,
            step=jnp.asarray(self.epoch * steps_per_epoch, jnp.int32))
        print(f"resumed PARAMS-ONLY from {path} (epoch {self.epoch}, "
              f"fresh optimizer state, step fast-forwarded to "
              f"{self.epoch * steps_per_epoch})", flush=True)
        return state

    # ------------------------------------------------------------------
    def train(self, max_epochs: int, load_latest: bool = True,
              fail_safe: bool = True, max_failures: int = 10) -> TrainState:
        """Epoch loop with crash-restart (reference
        ``base_trainer.py:51-86``)."""
        state = self.init_state()
        if load_latest:
            state = self._load_latest(state)

        failures = 0
        while self.epoch < max_epochs:
            try:
                self.epoch += 1
                for loader in self.loaders:
                    if self.epoch % loader.epoch_interval == 0:
                        state = self._cycle(state, loader)
                loss_avg = self._train_loss_avg()
                if is_divergent(loss_avg, self._best_train_loss,
                                self.divergence_factor):
                    failures += 1
                    if failures > max_failures:
                        raise RuntimeError(
                            f"diverged at epoch {self.epoch} (train loss "
                            f"{loss_avg} vs best "
                            f"{self._best_train_loss}) and "
                            "failure budget exhausted")
                    print(f"Divergence detected at epoch {self.epoch}: "
                          f"train loss {loss_avg:.6g} vs best "
                          f"{self._best_train_loss} "
                          f"(factor {self.divergence_factor}); NOT "
                          "checkpointing — rolling back to last good "
                          "checkpoint with a reseeded stream "
                          f"(failure {failures}/{max_failures})",
                          flush=True)
                    self._retry_salt += 1
                    self.epoch -= 1
                    state = self.init_state()
                    state = self._load_latest(state)
                    continue
                if loss_avg is not None and np.isfinite(loss_avg):
                    self._best_train_loss = loss_avg \
                        if self._best_train_loss is None \
                        else min(self._best_train_loss, loss_avg)
                self._save(state)
                if self.tb:
                    for loader in self.loaders:
                        if self.epoch % loader.epoch_interval == 0:
                            self.tb.write_epoch(
                                loader.name,
                                self.stats[loader.name].averages(),
                                self.epoch)
            except MidEpochDivergence as e:
                if not fail_safe:
                    raise
                failures += 1
                if failures > max_failures:
                    raise
                print(f"Mid-epoch divergence at epoch {self.epoch}: {e}; "
                      "aborting the cycle — rolling back to last good "
                      "checkpoint with a reseeded stream "
                      f"(failure {failures}/{max_failures})", flush=True)
                self._retry_salt += 1
                self.epoch -= 1
                state = self.init_state()
                state = self._load_latest(state)
            except Exception:
                if not fail_safe:
                    raise
                failures += 1
                if failures > max_failures:
                    raise
                print("Training crashed at epoch "
                      f"{self.epoch}; restarting from last checkpoint "
                      f"(failure {failures}/{max_failures})", flush=True)
                print(traceback.format_exc(), flush=True)
                self.epoch -= 1
                state = self.init_state()
                state = self._load_latest(state)
        if self._ckpt_writer is not None:
            self._ckpt_writer.flush()
        print("Finished training!", flush=True)
        return state
