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
from functools import partial
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
    @jax.jit
    def forward(params, burst):
        pred, _ = net.apply(params, burst[None])
        return jnp.clip(pred[0], 0.0, 1.0)

    return forward


def save_results(network_params: List[NetworkParam], dataset_root: str,
                 out_dir: str, workspace_dir: str = "",
                 dataset=None) -> None:
    """Run each network on the full validation set and write uint16 PNGs
    (reference ``evaluation/synburst/save_results.py:33-69``)."""
    dataset = dataset or SyntheticBurstVal(dataset_root)
    for n in network_params:
        net, params, _ = n.load_net(workspace_dir)
        forward = _forward_fn(net)
        d = os.path.join(out_dir, n.get_unique_name())
        os.makedirs(d, exist_ok=True)
        for idx in range(len(dataset)):
            burst, _, meta = dataset[idx]
            if n.burst_sz is not None:
                burst = burst[:n.burst_sz]
            pred = forward(params, jnp.asarray(burst))
            arr = (np.asarray(pred) * (2**14)).astype(np.uint16)
            write_png(os.path.join(d, f"{meta['burst_name']}.png"), arr)


def compute_score(network_params: List[NetworkParam], dataset_root: str,
                  workspace_dir: str = "",
                  saved_results_root: Optional[str] = None,
                  boundary_ignore: int = 40,
                  with_lpips: bool = True,
                  lpips_weights: Optional[str] = None,
                  with_msssim: bool = False,
                  max_bursts: Optional[int] = None,
                  dataset=None) -> Dict:
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

    @jax.jit
    def score_pair(pred, gt):
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

    names = []
    for n in network_params:
        name = n.get_display_name()
        names.append(name)
        forward = None
        params = None
        if n.saved_results_path is None and saved_results_root is None:
            net, params, _ = n.load_net(workspace_dir)
            forward = _forward_fn(net)

        vals = {m: [] for m in metric_names}
        for idx in range(n_bursts):
            burst, gt, meta = dataset[idx]
            if forward is not None:
                b = burst[:n.burst_sz] if n.burst_sz else burst
                pred = forward(params, jnp.asarray(b))
                pred = quantize(pred)
            else:
                root = n.saved_results_path or os.path.join(
                    saved_results_root, n.get_unique_name())
                arr = read_png(os.path.join(
                    root, f"{meta['burst_name']}.png"))
                pred = jnp.asarray(arr.astype(np.float32) / (2**14))
            gt_j = jnp.asarray(gt)
            s = score_pair(pred, gt_j)
            vals["psnr"].append(float(s["psnr"]))
            vals["ssim"].append(float(s["ssim"]))
            if with_msssim:
                vals["msssim"].append(float(s["msssim"]))
            if lpips_fn:
                vals["lpips"].append(float(lpips_fn(pred, gt_j,
                                                    boundary_ignore)))
        for m in metric_names:
            scores_all[m][name] = float(np.mean(vals[m]))

    report = generate_formatted_report(names, scores_all)
    print(report)
    return scores_all
