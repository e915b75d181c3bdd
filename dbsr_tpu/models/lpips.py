"""LPIPS perceptual metric (AlexNet backbone) in JAX.

Re-design of the reference's use of the ``lpips`` pip package
(`models/loss/image_quality_v2.py:139-163`, type='alex'): AlexNet conv
features at 5 stages, channel-unit-normalized, squared differences weighted
by learned non-negative 1x1 "lin" weights, spatially averaged and summed.

Pretrained weights cannot be downloaded in a zero-egress environment; this
module loads them from a converted ``.npz`` (see ``convert_from_torch``)
whose path comes from ``DBSR_TPU_LPIPS_WEIGHTS`` or the pretrained-nets
dir. Without weights, ``load_lpips`` raises so callers can gate the metric
(the eval report simply omits the LPIPS column).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature extractor config: (out_ch, kernel, stride, pad) per conv,
# with ReLU after each and maxpool(3, 2) after convs 0, 1, 4.
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# feature taps: after ReLU of each conv stage
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _alex_features(x, weights):
    """x: [B, H, W, 3] in [-1, 1] (lpips convention). Returns 5 taps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps = []
    for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
        w = weights[f"conv{i}_w"]  # [kh, kw, in, out]
        b = weights[f"conv{i}_b"]
        # HIGHEST: the reported metric must be exact f32 on TPU
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        x = jax.nn.relu(x)
        taps.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return taps


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt((feat**2).sum(axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance(pred, gt, weights, boundary_ignore: Optional[int] = None):
    """LPIPS(pred, gt) for [B, H, W, 3] images in [0, 1]."""
    if boundary_ignore:
        pred = pred[..., boundary_ignore:-boundary_ignore,
                    boundary_ignore:-boundary_ignore, :]
        gt = gt[..., boundary_ignore:-boundary_ignore,
                boundary_ignore:-boundary_ignore, :]
    # lpips expects [-1, 1]
    pred = pred * 2.0 - 1.0
    gt = gt * 2.0 - 1.0
    taps_p = _alex_features(pred, weights)
    taps_g = _alex_features(gt, weights)
    total = 0.0
    for i, (fp, fg) in enumerate(zip(taps_p, taps_g)):
        d = (_normalize(fp) - _normalize(fg)) ** 2
        lin = weights[f"lin{i}_w"]  # [1, 1, C, 1], non-negative
        d = jax.lax.conv_general_dilated(
            d, lin, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        total = total + d.mean(axis=(1, 2, 3))
    return total.mean()


def default_weights_path() -> Optional[str]:
    p = os.environ.get("DBSR_TPU_LPIPS_WEIGHTS")
    if p:
        return p
    from dbsr_tpu.environment import env_settings
    d = env_settings().pretrained_nets_dir
    if d:
        cand = os.path.join(d, "lpips_alex.npz")
        if os.path.exists(cand):
            return cand
    return None


def load_lpips(weights_path: Optional[str] = None) -> Callable:
    """Return ``fn(pred, gt, boundary_ignore) -> scalar`` or raise if no
    weights are available."""
    path = weights_path or default_weights_path()
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not found; set DBSR_TPU_LPIPS_WEIGHTS to a "
            "converted lpips_alex.npz (see models/lpips.py:"
            "convert_from_torch)")
    raw = np.load(path)
    weights = {k: jnp.asarray(raw[k]) for k in raw.files}
    return lpips_from_weights(weights)


def lpips_from_weights(weights) -> Callable:
    """Build the jitted metric fn from an in-memory weight dict
    (``boundary_ignore`` is a static arg — it selects slice shapes)."""
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def fn(pred, gt, boundary_ignore=None):
        if pred.ndim == 3:
            pred, gt = pred[None], gt[None]
        return lpips_distance(pred, gt, weights, boundary_ignore)

    return fn


def convert_from_torch(out_path: str) -> None:
    """Convert torchvision-AlexNet + lpips 'lin' weights to our .npz.

    Requires the ``lpips`` pip package (with its bundled weights) — run in
    an environment that has it, ship the .npz.
    """
    import lpips as lpips_pkg  # type: ignore

    model = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
        [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
        [m for m in model.net.slice5]
    conv_idx = 0
    import torch
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{conv_idx}_w"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
            conv_idx += 1
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}_w"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **out)
