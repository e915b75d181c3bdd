"""SyntheticBurstVal evaluation: save predictions + compute scores.

Re-design of reference ``evaluation/synburst/{save_results,
compute_score}.py``: per network, run the jitted model on each validation
burst, quantize predictions to uint16 at 2^14 scale (the protocol detail
that makes saved and recomputed scores identical —
``compute_score.py:110-111``), and accumulate PSNR / SSIM / (optional)
LPIPS with boundary_ignore=40.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.data.datasets import SyntheticBurstVal
from dbsr_tpu.evaluation.display import generate_formatted_report
from dbsr_tpu.evaluation.network_param import NetworkParam
from dbsr_tpu.ops import metrics as M
from dbsr_tpu.utils.png16 import read_png, write_png


_Q = 2**14


def quantize(pred: jax.Array) -> jax.Array:
    """uint16 2^14 quantization round-trip (reference
    ``compute_score.py:110-111``)."""
    q = jnp.clip(pred, 0.0, 1.0) * _Q
    return q.astype(jnp.uint16).astype(jnp.float32) / _Q


def _host_u16(a: np.ndarray) -> np.ndarray:
    """Host-side uint16 transfer encoding: val-set bursts/GTs originate
    from uint16 PNGs at 2^14 scale, so ``rint(a * 2^14)`` recovers the
    stored integers exactly — 4x fewer host->device bytes (the transfer
    dominated eval wall time over remote runtimes)."""
    return np.rint(a * _Q).astype(np.uint16)


def _dev_f32(a: jax.Array) -> jax.Array:
    """Undo :func:`_host_u16` on device (no-op for f32 inputs)."""
    if a.dtype == jnp.uint16:
        return a.astype(jnp.float32) / _Q
    return a


def _forward_fn(net):
    """Batched jitted forward: throughput saturates around batch 8 on v5e
    (PERF.md batch sweep) — per-burst forwards leave ~2x wall-clock on the
    table over the 300-burst protocol."""

    @jax.jit
    def forward(params, bursts):
        pred, _ = net.apply(params, _dev_f32(bursts))
        return jnp.clip(pred, 0.0, 1.0)

    return forward


def _scored_forward_fn(net, score_fn):
    """Fused eval step: forward + protocol quantization + per-sample
    metrics in ONE jitted call. The un-fused loop (separate forward,
    host-side ``quantize`` dispatches, ``score_batch``, then a blocking
    ``device_get`` per batch) is remote-dispatch-latency-bound on relayed
    runtimes — ~0.4 s/burst measured vs ~5 ms/burst device time."""

    @jax.jit
    def forward_score(params, bursts, gts):
        pred, _ = net.apply(params, _dev_f32(bursts))
        return score_fn(quantize(pred), _dev_f32(gts))

    return forward_score


def _iter_burst_batches(dataset, n_bursts: int, batch_size: int,
                        burst_sz: Optional[int], with_gt: bool = True,
                        u16_transfer: bool = False):
    """Yield ``(metas, bursts [b<=batch_size, ...], gts | None)`` with the
    dataset reads (disk IO + PNG decode) prefetched on a background thread,
    overlapping host IO with device compute. ``u16_transfer`` re-encodes
    to uint16 on the worker thread (see :func:`_host_u16`)."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=2)
    err = []

    def worker():
        try:
            for lo in range(0, n_bursts, batch_size):
                idxs = range(lo, min(lo + batch_size, n_bursts))
                items = [dataset[i] for i in idxs]
                bursts = np.stack([
                    it[0][:burst_sz] if burst_sz else it[0] for it in items])
                gts = np.stack([it[1] for it in items]) if with_gt else None
                if u16_transfer:
                    bursts = _host_u16(bursts)
                    gts = _host_u16(gts) if gts is not None else None
                q.put(([it[2] for it in items], bursts, gts))
            q.put(None)
        except Exception as e:
            err.append(e)
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            if err:
                raise err[0]
            return
        yield item


def _pad_to(arr: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad the leading dim to ``batch_size`` by repeating the last row (a
    fixed compiled shape; padded outputs are discarded)."""
    n = arr.shape[0]
    if n == batch_size:
        return arr
    reps = np.repeat(arr[-1:], batch_size - n, axis=0)
    return np.concatenate([arr, reps], axis=0)


def save_results(network_params: List[NetworkParam], dataset_root: str,
                 out_dir: str, workspace_dir: str = "",
                 dataset=None, batch_size: int = 8) -> None:
    """Run each network on the full validation set and write uint16 PNGs
    (reference ``evaluation/synburst/save_results.py:33-69``)."""
    dataset = dataset or SyntheticBurstVal(dataset_root)
    batch_size = min(batch_size, len(dataset))
    for n in network_params:
        net, params, _ = n.load_net(workspace_dir)
        forward = _forward_fn(net)
        d = os.path.join(out_dir, n.get_unique_name())
        os.makedirs(d, exist_ok=True)
        for metas, bursts, _ in _iter_burst_batches(
                dataset, len(dataset), batch_size, n.burst_sz,
                with_gt=False, u16_transfer=True):
            nb = bursts.shape[0]
            preds = forward(params, jnp.asarray(_pad_to(bursts, batch_size)))
            preds = np.asarray(preds[:nb])
            for meta, pred in zip(metas, preds):
                arr = (pred * (2**14)).astype(np.uint16)
                write_png(os.path.join(d, f"{meta['burst_name']}.png"), arr)


def _make_score_batch(boundary_ignore: int, with_msssim: bool):
    """Jitted per-sample protocol metrics over a batch (per-burst values
    averaged at the end, reference ``compute_score.py:112-121``)."""

    @jax.jit
    def score_batch(preds, gts):
        preds = _dev_f32(preds)
        gts = _dev_f32(gts)

        def one(pred, gt):
            out = {
                "psnr": M.psnr(pred[None], gt[None],
                               boundary_ignore=boundary_ignore),
                "ssim": M.ssim_metric(pred[None], gt[None],
                                      boundary_ignore=boundary_ignore),
            }
            if with_msssim:
                b = boundary_ignore
                out["msssim"] = M.msssim(
                    pred[None, b:-b, b:-b] if b else pred[None],
                    gt[None, b:-b, b:-b] if b else gt[None])
            return out

        return jax.vmap(one)(preds, gts)

    return score_batch


def compute_score(network_params: List[NetworkParam], dataset_root: str,
                  workspace_dir: str = "",
                  saved_results_root: Optional[str] = None,
                  boundary_ignore: int = 40,
                  with_lpips: bool = True,
                  lpips_weights: Optional[str] = None,
                  with_msssim: bool = False,
                  max_bursts: Optional[int] = None,
                  dataset=None, batch_size: int = 8) -> Dict:
    """PSNR / SSIM / LPIPS over the validation set (reference
    ``evaluation/synburst/compute_score.py:36-122``). ``saved_results_root``
    scores pre-saved predictions instead of running the nets
    (``--load_saved``)."""
    dataset = dataset or SyntheticBurstVal(dataset_root)
    n_bursts = min(len(dataset), max_bursts or len(dataset))

    lpips_fn = None
    if with_lpips:
        try:
            from dbsr_tpu.models.lpips import load_lpips
            lpips_fn = load_lpips(lpips_weights)
        except Exception as e:
            print(f"LPIPS unavailable ({e}); skipping")

    metric_names = ["psnr", "ssim"] + (["lpips"] if lpips_fn else [])
    if with_msssim:
        metric_names.append("msssim")
    scores_all: Dict[str, Dict[str, float]] = {m: {} for m in metric_names}

    batch_size = min(batch_size, n_bursts)
    score_batch = _make_score_batch(boundary_ignore, with_msssim)

    names = []
    for n in network_params:
        name = n.get_display_name()
        names.append(name)
        forward = None
        scored_forward = None
        params = None
        if n.saved_results_path is None and saved_results_root is None:
            net, params, _ = n.load_net(workspace_dir)
            if lpips_fn is None:
                scored_forward = _scored_forward_fn(net, score_batch)
            else:
                # LPIPS runs per-burst on host-visible predictions; keep
                # the un-fused path for that (rare) configuration.
                forward = _forward_fn(net)

        def load_saved_batch(metas):
            root = n.saved_results_path or os.path.join(
                saved_results_root, n.get_unique_name())
            arrs = [read_png(os.path.join(
                root, f"{m['burst_name']}.png")) for m in metas]
            # raw uint16 transfer; normalized on device (_dev_f32)
            return np.stack(arrs)

        vals = {m: [] for m in metric_names}
        t_loop = time.perf_counter()
        t_first = None
        # Metric fetches are deferred: per-batch device results queue on
        # the device and are pulled in ONE device_get after the loop —
        # a per-batch fetch serializes on dispatch latency.
        pending = []
        for metas, bursts, gts in _iter_burst_batches(
                dataset, n_bursts, batch_size, n.burst_sz,
                u16_transfer=True):
            nb = bursts.shape[0]
            gts_j = jnp.asarray(_pad_to(gts, batch_size))
            if scored_forward is not None:
                s = scored_forward(
                    params, jnp.asarray(_pad_to(bursts, batch_size)), gts_j)
            else:
                if forward is not None:
                    preds = forward(
                        params, jnp.asarray(_pad_to(bursts, batch_size)))
                    preds = quantize(preds)
                else:
                    preds = jnp.asarray(
                        _pad_to(load_saved_batch(metas), batch_size))
                s = score_batch(preds, gts_j)
                if lpips_fn:
                    for pred, gt_j in zip(preds[:nb], gts_j[:nb]):
                        vals["lpips"].append(float(lpips_fn(
                            _dev_f32(pred), _dev_f32(gt_j),
                            boundary_ignore)))
            pending.append((nb, s))
            if t_first is None:
                t_first = time.perf_counter() - t_loop
        t_dispatch = time.perf_counter() - t_loop
        host = jax.device_get([s for _, s in pending])
        for (nb, _), s in zip(pending, host):
            vals["psnr"] += list(s["psnr"][:nb])
            vals["ssim"] += list(s["ssim"][:nb])
            if with_msssim:
                vals["msssim"] += list(s["msssim"][:nb])
        # Stage timing: the first batch carries jit compile (or remote
        # compile-cache retrieval); the rest is the steady-state protocol.
        print(f"[timing] {name}: first batch {t_first:.1f}s (compile), "
              f"dispatch {t_dispatch - (t_first or 0.0):.1f}s, "
              f"fetch {time.perf_counter() - t_loop - t_dispatch:.1f}s "
              f"({n_bursts} bursts)", flush=True)
        for m in metric_names:
            scores_all[m][name] = float(np.mean(vals[m]))

    report = generate_formatted_report(names, scores_all)
    print(report)
    return scores_all


class TrajectoryScorer:
    """Stage the val set on device ONCE and score any number of
    checkpoints against it — the engine behind
    :func:`compute_score_trajectory` and the persistent eval worker
    (``util_scripts/eval_worker.py``).

    Per-checkpoint ``compute_score`` invocations each pay process init,
    val-set host->device transfer, and jit compile/retrieval; over a
    relayed runtime those fixed costs (~3 min) dwarf the ~10 s of device
    time a 300-burst scoring actually needs. A scorer instance amortizes
    them across every :meth:`score` call for the lifetime of the
    process. LPIPS is not supported on this path (it needs host-visible
    predictions — use ``compute_score`` with an explicit epoch).
    """

    def __init__(self, dataset_root: str, boundary_ignore: int = 40,
                 with_msssim: bool = False,
                 max_bursts: Optional[int] = None,
                 burst_sz: Optional[int] = None,
                 dataset=None, batch_size: int = 8):
        dataset = dataset or SyntheticBurstVal(dataset_root)
        n_bursts = min(len(dataset), max_bursts or len(dataset))
        self.batch_size = min(batch_size, n_bursts)
        self.metric_names = ["psnr", "ssim"] + (
            ["msssim"] if with_msssim else [])
        self._score_batch = _make_score_batch(boundary_ignore, with_msssim)
        self._scored_forward = None  # built from the first checkpoint
        # stage the val set on device once, reused across every epoch
        self.staged = []
        for _, bursts, gts in _iter_burst_batches(
                dataset, n_bursts, self.batch_size, burst_sz,
                u16_transfer=True):
            self.staged.append(
                (bursts.shape[0],
                 jnp.asarray(_pad_to(bursts, self.batch_size)),
                 jnp.asarray(_pad_to(gts, self.batch_size))))

    def score(self, module: str, parameter: str, workspace_dir: str = "",
              net_name: str = "dbsr_synthetic",
              epochs: Optional[List[int]] = None) -> Dict:
        """Score the run's checkpoints (all, or the given epochs).
        Returns the ``compute_score`` dict shape:
        ``{metric: {"<module>_<parameter>_epNNNN": value}}``,
        epoch-sorted. The fused scored-forward graph is built from the
        first checkpoint ever scored and reused for all later calls
        (the architecture is constant across a run; params are a traced
        argument)."""
        from dbsr_tpu.training.checkpoint import (list_checkpoints,
                                                  load_network)

        ckpt_dir = os.path.join(workspace_dir, module, parameter)
        all_ck = list_checkpoints(ckpt_dir, net_name)
        if epochs is not None:
            want = set(epochs)
            all_ck = [(e, p) for e, p in all_ck if e in want]
        if not all_ck:
            raise FileNotFoundError(
                f"no checkpoints for {module}/{parameter} in {ckpt_dir}")

        if self._scored_forward is None:
            net, _, _ = load_network(all_ck[0][1])
            self._scored_forward = _scored_forward_fn(net,
                                                      self._score_batch)

        scores_all: Dict[str, Dict[str, float]] = {
            m: {} for m in self.metric_names}
        names = []
        for e, path in all_ck:
            params = load_network(path)[1]
            pending = [(nb, self._scored_forward(params, b, g))
                       for nb, b, g in self.staged]
            host = jax.device_get([s for _, s in pending])
            vals = {m: [] for m in self.metric_names}
            for (nb, _), s in zip(pending, host):
                for m in self.metric_names:
                    vals[m] += list(s[m][:nb])
            name = f"{module}_{parameter}_ep{e:04d}"
            names.append(name)
            for m in self.metric_names:
                scores_all[m][name] = float(np.mean(vals[m]))
            print("[trajectory] " + name + ": " + ", ".join(
                f"{m}={scores_all[m][name]:.4f}"
                for m in self.metric_names), flush=True)

        print(generate_formatted_report(names, scores_all))
        return scores_all


def compute_score_trajectory(module: str, parameter: str, dataset_root: str,
                             workspace_dir: str = "",
                             net_name: str = "dbsr_synthetic",
                             epochs: Optional[List[int]] = None,
                             boundary_ignore: int = 40,
                             with_msssim: bool = False,
                             max_bursts: Optional[int] = None,
                             burst_sz: Optional[int] = None,
                             dataset=None, batch_size: int = 8) -> Dict:
    """Score EVERY checkpoint of a training run in one process (model-zoo
    trajectory scoring; no reference analog — their ``compute_score.py``
    loads one net per process). One-shot wrapper over
    :class:`TrajectoryScorer`."""
    scorer = TrajectoryScorer(dataset_root, boundary_ignore=boundary_ignore,
                              with_msssim=with_msssim,
                              max_bursts=max_bursts, burst_sz=burst_sz,
                              dataset=dataset, batch_size=batch_size)
    return scorer.score(module, parameter, workspace_dir=workspace_dir,
                        net_name=net_name, epochs=epochs)
