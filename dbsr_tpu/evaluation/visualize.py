"""Result visualization: PNG panels + an interactive HTML viewer.

The reference ships an interactive OpenCV viewer
(``utils/opencv_plotting.py:22-464``, ``evaluation/*/visualize_results.py``)
with zoom/pan/toggle. Headless TPU pods have no display, so the TPU-native
equivalent renders (a) side-by-side comparison panels (base frame upsampled
| prediction | ground truth, per-image PSNR in the filename) to PNG files,
and (b) a dependency-free ``index.html`` with the interactive affordances
of the reference viewer — wheel zoom, drag pan, per-pane toggle, burst
navigation (``evaluation/html_viewer.py``) — usable over ``file://``.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.data.datasets import SyntheticBurstVal
from dbsr_tpu.evaluation.html_viewer import write_viewer
from dbsr_tpu.evaluation.network_param import NetworkParam
from dbsr_tpu.ops import metrics as M
from dbsr_tpu.ops.camera import process_linear_image_rgb, demosaic_naive
from dbsr_tpu.ops.interp import resize_bilinear
from dbsr_tpu.utils.png16 import write_png


def _to_u8(im: np.ndarray) -> np.ndarray:
    return (np.clip(im, 0, 1) * 255).astype(np.uint8)


def _postprocess(im, meta):
    """Apply the synthesis-time ISP for display when meta is available."""
    try:
        m = {k: jnp.asarray(np.asarray(v)) if hasattr(v, "shape") or
             isinstance(v, (int, float)) else v for k, v in meta.items()}
        return np.asarray(process_linear_image_rgb(jnp.asarray(im), m))
    except Exception:
        return np.asarray(im)


def visualize_synburst(network_params: List[NetworkParam],
                       dataset_root: str, out_dir: str,
                       workspace_dir: str = "",
                       max_bursts: int = 10,
                       boundary_ignore: int = 40,
                       dataset=None) -> None:
    dataset = dataset if dataset is not None \
        else SyntheticBurstVal(dataset_root)
    os.makedirs(out_dir, exist_ok=True)
    for n in network_params:
        net, params, _ = n.load_net(workspace_dir)

        @jax.jit
        def forward(params, burst):
            pred, _ = net.apply(params, burst[None])
            return jnp.clip(pred[0], 0.0, 1.0)

        d = os.path.join(out_dir, n.get_unique_name())
        os.makedirs(d, exist_ok=True)
        entries = []
        for idx in range(min(max_bursts, len(dataset))):
            burst, gt, meta = dataset[idx]
            b = burst[:n.burst_sz] if n.burst_sz else burst
            pred = np.asarray(forward(params, jnp.asarray(b)))
            psnr = float(M.psnr(jnp.asarray(pred)[None],
                                jnp.asarray(gt)[None],
                                boundary_ignore=boundary_ignore))

            base = np.asarray(demosaic_naive(jnp.asarray(burst[0])))
            base_up = np.asarray(resize_bilinear(
                jnp.asarray(base), (gt.shape[0], gt.shape[1])))

            panes = {"base frame": base_up, "prediction": pred,
                     "ground truth": gt}
            name = meta["burst_name"]
            entry = {"name": name, "info": f"PSNR {psnr:.2f} dB",
                     "panes": {}}
            for label, im in panes.items():
                fn = f"{name}_{label.split()[0]}.png"
                write_png(os.path.join(d, fn),
                          _to_u8(_postprocess(im, meta)))
                entry["panes"][label] = fn
            entries.append(entry)

            panel = np.concatenate(
                [_to_u8(_postprocess(x, meta)) for x in
                 (base_up, pred, gt)], axis=1)
            write_png(os.path.join(
                d, f"{name}_psnr{psnr:.2f}.png"), panel)
        write_viewer(d, f"synburst: {n.get_unique_name()}", entries)


def visualize_burstsr(network_params, dataset_root: str, out_dir: str,
                      workspace_dir: str = "", max_bursts: int = 5,
                      sr_factor: int = 4) -> None:
    """BurstSR comparison panels: base frame (upsampled) | SCA-aligned
    prediction | DSLR GT, with aligned PSNR in the filename (offline
    stand-in for reference ``evaluation/burstsr/visualize_results.py``)."""
    from dbsr_tpu.data.burstsr import get_burstsr_val_set
    from dbsr_tpu.evaluation.burstsr import _alignment_apply_from
    from dbsr_tpu.models.sca import make_sca

    dataset = get_burstsr_val_set(dataset_root)
    os.makedirs(out_dir, exist_ok=True)
    for n in network_params:
        net, params, _ = n.load_net(workspace_dir)
        sca = make_sca(_alignment_apply_from(params), sr_factor=sr_factor)

        @jax.jit
        def run_one(params, burst, gt):
            pred, _ = net.apply(params, burst[None])
            pred = jnp.clip(pred, 0.0, 1.0)
            pred_m, valid = sca(pred, gt[None], burst[None])
            valid = valid.astype(jnp.float32)
            p = M.psnr(pred_m, gt[None], boundary_ignore=40, valid=valid)
            return pred_m[0], p

        d = os.path.join(out_dir, n.get_unique_name())
        os.makedirs(d, exist_ok=True)
        entries = []
        for idx in range(min(max_bursts, len(dataset))):
            sample = dataset[idx]
            burst = jnp.asarray(sample["burst"][:n.burst_sz]
                                if n.burst_sz else sample["burst"])
            gt = jnp.asarray(sample["frame_gt"])
            pred_m, psnr = run_one(params, burst, gt)
            base = np.asarray(demosaic_naive(burst[0]))
            base_up = np.asarray(resize_bilinear(
                jnp.asarray(base), gt.shape[:2]))
            name = sample["burst_name"]
            panes = {"base frame": base_up,
                     "aligned prediction": np.asarray(pred_m),
                     "DSLR ground truth": np.asarray(gt)}
            entry = {"name": name,
                     "info": f"aligned PSNR {float(psnr):.2f} dB",
                     "panes": {}}
            for label, im in panes.items():
                fn = f"{name}_{label.split()[0]}.png"
                write_png(os.path.join(d, fn), _to_u8(im))
                entry["panes"][label] = fn
            entries.append(entry)
            panel = np.concatenate(
                [_to_u8(x) for x in (base_up, np.asarray(pred_m),
                                     np.asarray(gt))], axis=1)
            write_png(os.path.join(
                d, f"{name}_apsnr{float(psnr):.2f}.png"), panel)
        write_viewer(d, f"burstsr: {n.get_unique_name()}", entries)
