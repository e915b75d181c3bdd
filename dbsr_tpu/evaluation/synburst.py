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
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.data.datasets import SyntheticBurstVal
from dbsr_tpu.evaluation.display import generate_formatted_report
from dbsr_tpu.evaluation.network_param import NetworkParam
from dbsr_tpu.ops import metrics as M
from dbsr_tpu.utils.png16 import read_png, write_png


def quantize(pred: jax.Array) -> jax.Array:
    """uint16 2^14 quantization round-trip (reference
    ``compute_score.py:110-111``)."""
    q = jnp.clip(pred, 0.0, 1.0) * (2**14)
    return q.astype(jnp.uint16).astype(jnp.float32) / (2**14)


def _forward_fn(net):
    """Batched jitted forward: throughput saturates around batch 8 on v5e
    (PERF.md batch sweep) — per-burst forwards leave ~2x wall-clock on the
    table over the 300-burst protocol."""

    @jax.jit
    def forward(params, bursts):
        pred, _ = net.apply(params, bursts)
        return jnp.clip(pred, 0.0, 1.0)

    return forward


def _iter_burst_batches(dataset, n_bursts: int, batch_size: int,
                        burst_sz: Optional[int], with_gt: bool = True):
    """Yield ``(metas, bursts [b<=batch_size, ...], gts | None)`` with the
    dataset reads (disk IO + PNG decode) prefetched on a background thread,
    overlapping host IO with device compute."""
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
                with_gt=False):
            nb = bursts.shape[0]
            preds = forward(params, jnp.asarray(_pad_to(bursts, batch_size)))
            preds = np.asarray(preds[:nb])
            for meta, pred in zip(metas, preds):
                arr = (pred * (2**14)).astype(np.uint16)
                write_png(os.path.join(d, f"{meta['burst_name']}.png"), arr)


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

    @jax.jit
    def score_batch(preds, gts):
        """Per-sample metrics over the batch (protocol: per-burst values
        averaged at the end, reference ``compute_score.py:112-121``)."""

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

    names = []
    for n in network_params:
        name = n.get_display_name()
        names.append(name)
        forward = None
        params = None
        if n.saved_results_path is None and saved_results_root is None:
            net, params, _ = n.load_net(workspace_dir)
            forward = _forward_fn(net)

        def load_saved_batch(metas):
            root = n.saved_results_path or os.path.join(
                saved_results_root, n.get_unique_name())
            arrs = [read_png(os.path.join(
                root, f"{m['burst_name']}.png")) for m in metas]
            return np.stack(arrs).astype(np.float32) / (2**14)

        vals = {m: [] for m in metric_names}
        for metas, bursts, gts in _iter_burst_batches(
                dataset, n_bursts, batch_size, n.burst_sz):
            nb = bursts.shape[0]
            if forward is not None:
                preds = forward(params,
                                jnp.asarray(_pad_to(bursts, batch_size)))
                preds = quantize(preds)
            else:
                preds = jnp.asarray(
                    _pad_to(load_saved_batch(metas), batch_size))
            gts_j = jnp.asarray(_pad_to(gts, batch_size))
            s = jax.device_get(score_batch(preds, gts_j))
            vals["psnr"] += list(s["psnr"][:nb])
            vals["ssim"] += list(s["ssim"][:nb])
            if with_msssim:
                vals["msssim"] += list(s["msssim"][:nb])
            if lpips_fn:
                for pred, gt_j in zip(preds[:nb], gts_j[:nb]):
                    vals["lpips"].append(float(lpips_fn(pred, gt_j,
                                                        boundary_ignore)))
        for m in metric_names:
            scores_all[m][name] = float(np.mean(vals[m]))

    report = generate_formatted_report(names, scores_all)
    print(report)
    return scores_all
