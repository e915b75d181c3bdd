"""BurstSR evaluation: aligned PSNR/SSIM/LPIPS on the real-world val set.

Re-design of reference ``evaluation/burstsr/{save_results,
compute_score}.py``: every prediction is passed through
SpatialColorAlignment (flow-warp to the DSLR GT + least-squares color
match + validity mask) before the masked metrics
(``compute_score.py:123-128``).

The flow net used by SCA is the DBSR model's own alignment subnetwork
(params live under ``encoder/alignment_net`` in the checkpoint), so no
separate pretrained-flow download is needed.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.data.burstsr import get_burstsr_val_set
from dbsr_tpu.evaluation.display import generate_formatted_report
from dbsr_tpu.evaluation.network_param import NetworkParam
from dbsr_tpu.models.pwcnet import PWCNet
from dbsr_tpu.models.sca import make_sca
from dbsr_tpu.ops import metrics as M
from dbsr_tpu.utils.png16 import read_png, write_png


def _alignment_apply_from(params):
    """Bind the checkpoint's aligner (PWC-Net or AlignLite, detected
    from the ``encoder/alignment_net`` parameter structure) to an
    ``(source, target) -> flow`` apply for SCA. AlignLite is applied
    coarse-to-fine (scales 4 -> 1), extending its displacement envelope
    to ~±64 px at SCA scales."""
    sub = params["params"]["encoder"]["alignment_net"]
    if "extractor" in sub and "dec0" in sub:
        from dbsr_tpu.models.align_lite import (AlignLiteNet,
                                                coarse_to_fine_flow)
        net = AlignLiteNet()
        align_params = {"params": sub}
        # SCA inputs are full-RGB at prediction scale (8x the packed
        # pitch AlignLite trains at): apply coarse-to-fine so the
        # displacement and content pitch land in its trained regime
        # (measured: direct application recovers ~20% of a 7 px shift;
        # coarse-to-fine recovers it — tests/test_synthetic_burstsr.py)
        return lambda s, t: coarse_to_fine_flow(
            lambda a, b: net.apply(align_params, a, b), s, t)
    net = PWCNet()
    align_params = {"params": sub}
    return lambda s, t: net.apply(align_params, s, t)


def save_results(network_params: List[NetworkParam], dataset_root: str,
                 out_dir: str, workspace_dir: str = "") -> None:
    """Raw (un-aligned) predictions as uint16 PNGs (reference
    ``evaluation/burstsr/save_results.py:33-69``)."""
    dataset = get_burstsr_val_set(dataset_root)
    for n in network_params:
        net, params, _ = n.load_net(workspace_dir)

        @jax.jit
        def forward(params, burst):
            pred, _ = net.apply(params, burst[None])
            return jnp.clip(pred[0], 0.0, 1.0)

        d = os.path.join(out_dir, n.get_unique_name())
        os.makedirs(d, exist_ok=True)
        for idx in range(len(dataset)):
            sample = dataset[idx]
            burst = sample["burst"]
            if n.burst_sz is not None:
                burst = burst[:n.burst_sz]
            pred = forward(params, jnp.asarray(burst))
            arr = (np.asarray(pred) * (2**14)).astype(np.uint16)
            write_png(os.path.join(d, f"{sample['burst_name']}.png"), arr)


def compute_score(network_params: List[NetworkParam], dataset_root: str,
                  workspace_dir: str = "", boundary_ignore: int = 40,
                  max_bursts: Optional[int] = None,
                  with_lpips: bool = True,
                  lpips_weights: Optional[str] = None, dataset=None,
                  sr_factor: int = 4) -> Dict:
    """Aligned metrics over the BurstSR val set (reference
    ``evaluation/burstsr/compute_score.py:38-136``)."""
    dataset = dataset or get_burstsr_val_set(dataset_root)
    n_bursts = min(len(dataset), max_bursts or len(dataset))

    lpips_fn = None
    if with_lpips:
        try:
            from dbsr_tpu.models.lpips import load_lpips
            lpips_fn = load_lpips(lpips_weights)
        except Exception as e:
            print(f"LPIPS unavailable ({e}); skipping")

    metric_names = ["psnr", "ssim"] + (["lpips"] if lpips_fn else [])
    scores_all: Dict[str, Dict[str, float]] = {m: {} for m in metric_names}
    names = []

    for n in network_params:
        name = n.get_display_name()
        names.append(name)
        net, params, _ = n.load_net(workspace_dir)
        sca = make_sca(_alignment_apply_from(params), sr_factor=sr_factor)

        @jax.jit
        def eval_one(params, burst, gt):
            pred, _ = net.apply(params, burst[None])
            pred = jnp.clip(pred, 0.0, 1.0)
            pred_m, valid = sca(pred, gt[None], burst[None])
            valid = valid.astype(jnp.float32)
            out = {
                "psnr": M.psnr(pred_m, gt[None],
                               boundary_ignore=boundary_ignore, valid=valid),
                "ssim": M.ssim_metric(pred_m, gt[None],
                                      boundary_ignore=boundary_ignore,
                                      valid=valid),
            }
            return out, pred_m, valid

        vals = {m: [] for m in metric_names}
        # Defer metric fetches: queue per-burst device results and pull
        # them in one device_get after the loop (a per-burst float() sync
        # serializes on dispatch latency over remote runtimes).
        pending = []
        for idx in range(n_bursts):
            sample = dataset[idx]
            burst = jnp.asarray(sample["burst"][:n.burst_sz]
                                if n.burst_sz else sample["burst"])
            gt = jnp.asarray(sample["frame_gt"])
            s, pred_m, valid = eval_one(params, burst, gt)
            pending.append(s)
            if lpips_fn:
                vals["lpips"].append(
                    float(lpips_fn(pred_m[0], gt, boundary_ignore)))
        for s in jax.device_get(pending):
            vals["psnr"].append(float(s["psnr"]))
            vals["ssim"].append(float(s["ssim"]))
        for m in metric_names:
            scores_all[m][name] = float(np.mean(vals[m]))

    print(generate_formatted_report(names, scores_all))
    return scores_all
