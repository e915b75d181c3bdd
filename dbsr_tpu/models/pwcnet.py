"""PWC-Net optical flow (flax, NHWC) with the Pallas correlation kernel.

TPU-native re-design of reference ``models/alignment/pwcnet.py`` (the
sniklaus pytorch-pwc port): a 6-level feature pyramid extractor, coarse-to-
fine decoders with an 81-channel cost volume (our Pallas kernel,
``dbsr_tpu/ops/correlation.py``), DenseNet-style feature aggregation, a
dilated-conv context refiner, and a wrapper that resizes inputs to a
multiple of 64 and rescales the ( x20 ) flow back to input resolution
(reference ``pwcnet.py:234-281``).

Level conventions follow the reference: pyramid levels 1..6 halve
resolution each; decoders run at levels 6->2; upsampled flow is pre-scaled
by [5.0, 2.5, 1.25, 0.625] at levels 2..5 before backwarping
(reference ``pwcnet.py:121``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dbsr_tpu.models.layers import (ConvBlock, TorchConvTranspose,
                                    make_torch_bias_init,
                                    torch_conv_kernel_init)
from dbsr_tpu.ops.correlation import cost_volume
from dbsr_tpu.ops.interp import backwarp_auto, resize_bilinear

# feature channels of pyramid levels 1..6
_PYRAMID_CH = (16, 32, 64, 96, 128, 196)
# decoder-level extra feature channels (level -> pyramid features used)
_LEVEL_FEAT = {2: 32, 3: 64, 4: 96, 5: 128}
# upsampled-flow scale factor applied before backwarp at each decoder level
_BACKWARP_SCALE = {2: 5.0, 3: 2.5, 4: 1.25, 5: 0.625}


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _conv(features, stride=1, dilation=1, name=None, dtype=None):
    return ConvBlock(features, kernel_size=3, stride=stride,
                     dilation=dilation, activation="none", name=name,
                     dtype=dtype)


class Extractor(nn.Module):
    """6-level strided conv pyramid (reference ``pwcnet.py:45-111``)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feats = []
        for lvl, ch in enumerate(_PYRAMID_CH):
            d = self.dtype
            x = _leaky(_conv(ch, stride=2, name=f"lvl{lvl + 1}_conv0",
                             dtype=d)(x))
            x = _leaky(_conv(ch, name=f"lvl{lvl + 1}_conv1", dtype=d)(x))
            x = _leaky(_conv(ch, name=f"lvl{lvl + 1}_conv2", dtype=d)(x))
            feats.append(x)
        return feats


class Decoder(nn.Module):
    """One coarse-to-fine flow decoder level (reference ``pwcnet.py:113-184``).

    Dense aggregation: each of the 5 conv stages consumes the concat of all
    previous stage outputs + the input volume; a final conv maps to 2-channel
    flow.
    """
    level: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_first, feat_second, prev):
        if prev is None:
            volume = _leaky(cost_volume(feat_first, feat_second))
            feat = volume
            flow_up = None
        else:
            flow_up = TorchConvTranspose(2, 4, 2, 1, name="upflow")(
                prev["flow"])
            feat_up = TorchConvTranspose(2, 4, 2, 1, name="upfeat")(
                prev["feat"])
            # backwarp_auto: MXU hat-matrix formulation on TPU at these
            # small pyramid sizes (2.5-5.5x the gather path on-chip),
            # gather formulation elsewhere — numerics tested equal.
            warped = backwarp_auto(feat_second,
                                   flow_up * _BACKWARP_SCALE[self.level])
            volume = _leaky(cost_volume(feat_first, warped))
            feat = jnp.concatenate([volume, feat_first, flow_up, feat_up],
                                   axis=-1)

        for i, ch in enumerate((128, 128, 96, 64, 32)):
            out = _leaky(_conv(ch, name=f"dense{i}", dtype=self.dtype)(feat))
            feat = jnp.concatenate([out, feat], axis=-1)
        flow = _conv(2, name="flow_head", dtype=self.dtype)(feat)
        return {"flow": flow, "feat": feat}


class Refiner(nn.Module):
    """Dilated-conv context network (reference ``pwcnet.py:186-207``)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, (ch, dil) in enumerate(
                ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))):
            x = _leaky(_conv(ch, dilation=dil, name=f"ctx{i}",
                             dtype=self.dtype)(x))
        return _conv(2, name="ctx_flow", dtype=self.dtype)(x)


class PWCFlowNet(nn.Module):
    """Core PWC network: pyramid + 5 decoders + refiner
    (reference ``pwcnet.py:221-231``). Inputs are two ``[B, H, W, 3]``
    images with H, W multiples of 64; output is level-2 flow (1/4 res,
    unscaled)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, im_first, im_second, return_pyramid: bool = False,
                 first_repeat: int = 1):
        """``first_repeat > 1``: every ``first_repeat`` consecutive
        ``im_second`` entries share ONE ``im_first`` (burst frames vs a
        single reference); ``im_first``'s batch is then
        ``im_second / first_repeat`` and its pyramid is extracted once
        per unique image and broadcast — numerically identical to
        pre-broadcasting (siamese extractor, per-pair decoders)."""
        d = self.dtype
        extractor = Extractor(name="extractor", dtype=d)
        f1 = extractor(im_first)
        f2 = extractor(im_second)
        if first_repeat > 1:
            f1 = [jnp.repeat(f, first_repeat, axis=0) for f in f1]

        pyramid = {}
        est = None
        for lvl in (6, 5, 4, 3, 2):
            est = Decoder(lvl, name=f"dec{lvl}", dtype=d)(
                f1[lvl - 1], f2[lvl - 1], est)
            pyramid[lvl] = est["flow"]

        flow = est["flow"] + Refiner(name="refiner", dtype=d)(est["feat"])
        if return_pyramid:
            pyramid[2] = flow  # supervise the refined level-2 flow
            return flow, pyramid
        return flow


class BurstFlowNet(nn.Module):
    """Standalone burst->flow wrapper for PWC pretraining.

    The reference always initializes DBSR's aligner from pretrained PWC
    weights and keeps it frozen (``models/dbsr/dbsrnet.py:59-60`` +
    ``install.sh`` download). Zero-egress environments can't download
    those weights, but the synthesis pipeline emits EXACT dense flow
    labels for free (``data/synthetic.py:single2lrburst``) — this module
    reproduces the aligner's exact input contract (demosaiced packed
    burst, frames 1..N-1 vs frame 0, identical to
    ``dbsr.AlignedEncoder``) so a flow net pretrained here grafts
    directly into DBSRNet: the inner module is named ``alignment_net``,
    matching the ``encoder/alignment_net`` parameter subtree.

    ``__call__(burst [B, N, h, w, 4]) -> flow [B, N-1, h, w, 2]``; with
    ``return_pyramid=True`` also returns the raw decoder-level flows for
    multi-scale supervision (final-flow-only supervision stalls — PWC's
    gradient signal must enter at the coarse decoders first, the standard
    multi-scale training recipe).
    """
    dtype: Any = None

    @nn.compact
    def __call__(self, burst, return_pyramid: bool = False):
        from dbsr_tpu.ops.camera import demosaic_naive

        assert burst.ndim == 5, "expected [B, N, h, w, 4] packed burst"
        B, N = burst.shape[0], burst.shape[1]
        rgb = demosaic_naive(burst)
        ref = rgb[:, 0]  # unique per burst; pyramid broadcast inside
        oth = rgb[:, 1:]
        flat = lambda x: x.reshape((-1,) + x.shape[-3:])  # noqa: E731
        net = PWCNet(name="alignment_net", dtype=self.dtype)
        if return_pyramid:
            flow, aux = net(flat(oth), ref, return_pyramid=True,
                            target_repeat=N - 1)
            flow = flow.reshape((B, N - 1) + flow.shape[-3:])
            return flow.astype(jnp.float32), aux
        flow = net(flat(oth), ref, target_repeat=N - 1)
        return flow.reshape((B, N - 1) + flow.shape[-3:]).astype(
            jnp.float32)


class PWCNet(nn.Module):
    """User-facing flow wrapper (reference ``pwcnet.py:234-281``).

    ``__call__(source, target)`` estimates flow such that
    ``target(p) ~= source(p + flow(p))`` — note the reference feeds
    ``net(target, source)`` internally. Inputs are resized to the next
    multiple of 64, the level-2 flow is scaled x20, bilinearly upsampled to
    the input resolution, and per-axis rescaled by (input/preprocessed).
    """
    dtype: Any = None

    @nn.compact
    def __call__(self, source_img, target_img, return_pyramid: bool = False,
                 target_repeat: int = 1):
        """``target_repeat > 1``: every ``target_repeat`` consecutive
        sources share ONE target whose pyramid is extracted once and
        broadcast (see ``PWCFlowNet``); ``target_img``'s leading size is
        then ``sources / target_repeat``."""
        assert source_img.shape[-3:] == target_img.shape[-3:]
        lead = source_img.shape[:-3]
        H, W = source_img.shape[-3], source_img.shape[-2]
        src = source_img.reshape((-1, H, W, 3))
        tgt = target_img.reshape((-1, H, W, 3))
        assert tgt.shape[0] * target_repeat == src.shape[0], (
            src.shape, tgt.shape, target_repeat)

        Hp = int(math.ceil(H / 64.0) * 64)
        Wp = int(math.ceil(W / 64.0) * 64)
        if (Hp, Wp) != (H, W):
            src_r = resize_bilinear(src, (Hp, Wp))
            tgt_r = resize_bilinear(tgt, (Hp, Wp))
        else:
            src_r, tgt_r = src, tgt

        net = PWCFlowNet(name="net", dtype=self.dtype)
        if return_pyramid:
            raw, pyramid = net(tgt_r, src_r, return_pyramid=True,
                               first_repeat=target_repeat)
        else:
            raw = net(tgt_r, src_r, first_repeat=target_repeat)
        flow = 20.0 * resize_bilinear(raw, (H, W))
        scale = jnp.array([W / Wp, H / Hp], flow.dtype)
        flow = (flow * scale).reshape(lead + (H, W, 2))
        if return_pyramid:
            # raw pyramid flows share the 'x20 of preprocessed-full-res px'
            # unit at every level (the backwarp scale table encodes exactly
            # this: 20 / 2^L); callers supervising them need (Hp, Wp)
            pyramid = {lvl: f.reshape(lead + f.shape[-3:])
                       for lvl, f in pyramid.items()}
            return flow, {"pyramid": pyramid, "preprocessed_hw": (Hp, Wp)}
        return flow
