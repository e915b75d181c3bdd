"""AlignLite: a purpose-built small-displacement burst aligner.

The reference always initializes DBSR's aligner from *downloaded*
pretrained PWC-Net weights and freezes it (reference
``models/dbsr/dbsrnet.py:59-60`` + ``install.sh:93-99``); the weights
come from FlyingChairs-scale training (~1.2M iterations at >=448 px)
that is unreproducible here (zero egress, and PWC's 6-level pyramid
degenerates at the 48x48->64x64 burst-SR input size: level 6 is 1x1 px).
Round 3's probes confirmed from-scratch PWC converges to the zero-flow
baseline on this regime.

AlignLite is the TPU-first answer: a 3-level siamese correlation
network sized FOR the burst-SR flow regime (|flow| <= ~4 packed px,
translation-dominant affine motion, heavy shot/read noise):

  * shared conv feature pyramid at 1x / 1/2 / 1/4 resolution;
  * the framework's 81-channel +-4 cost volume
    (``dbsr_tpu/ops/correlation.py`` — the Pallas kernel) at every
    level: at 1/4 res the +-4 search window spans +-16 input px,
    ~5x the maximum synthetic-burst displacement, so the coarsest
    level sees the full flow range directly (no blind warm-start like
    PWC's level 6);
  * coarse-to-fine refinement: upsample, backwarp the source features,
    correlate the residual, predict a delta;
  * a small dilated-conv context refiner at full resolution.

Every level predicts flow in ITS OWN grid's pixels (the unit the
correlation channels measure), so multi-scale supervision needs no unit
juggling: the target at level l is the block-pooled dense label
rescaled by ``pack_flow_to``. Trained supervised on the synthesis
pipeline's exact dense flow labels (``data/synthetic.py``) it reaches
sub-pixel EPE in a few thousand steps — the functional replacement for
the reference's pretrained-PWC download. The PWC-Net architecture
itself stays in the tree (``models/pwcnet.py``) as the parity
component and for SCA's larger-image flows.

Flow convention matches ``models.pwcnet.PWCNet``:
``__call__(source, target) -> flow`` with
``target(p) ~= source(p + flow(p))`` — i.e. ``backwarp(source, flow)``
aligns the source image to the target.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dbsr_tpu.models.layers import ConvBlock
from dbsr_tpu.ops.correlation import cost_volume
from dbsr_tpu.ops.interp import backwarp_auto, resize_bilinear

# feature channels at pyramid levels 0 (full res), 1 (1/2), 2 (1/4)
_FEAT_CH = (24, 48, 96)
# decoder conv widths per level
_DEC_CH = {2: (96, 64), 1: (64, 48), 0: (48, 32)}


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _conv(features, stride=1, dilation=1, name=None, dtype=None):
    return ConvBlock(features, kernel_size=3, stride=stride,
                     dilation=dilation, activation="none", name=name,
                     dtype=dtype)


class LiteExtractor(nn.Module):
    """Shared (siamese) 3-level feature pyramid."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        feats = []
        for lvl, ch in enumerate(_FEAT_CH):
            stride = 1 if lvl == 0 else 2
            x = _leaky(_conv(ch, stride=stride, name=f"lvl{lvl}_conv0",
                             dtype=d)(x))
            x = _leaky(_conv(ch, name=f"lvl{lvl}_conv1", dtype=d)(x))
            feats.append(x)
        return feats


class LiteDecoder(nn.Module):
    """One refinement level: correlate (residual) displacement, predict
    flow (level 2) or a flow delta (levels 1, 0) in this level's px."""
    level: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_tgt, feat_src, flow_up):
        if flow_up is None:
            volume = _leaky(cost_volume(feat_tgt, feat_src))
            x = jnp.concatenate([volume, feat_tgt], axis=-1)
        else:
            warped = backwarp_auto(feat_src, flow_up)
            volume = _leaky(cost_volume(feat_tgt, warped))
            x = jnp.concatenate([volume, feat_tgt, flow_up], axis=-1)
        for i, ch in enumerate(_DEC_CH[self.level]):
            x = _leaky(_conv(ch, name=f"dec{i}", dtype=self.dtype)(x))
        delta = _conv(2, name="flow_head", dtype=self.dtype)(x)
        flow = delta if flow_up is None else flow_up + delta
        return flow, x


class LiteRefiner(nn.Module):
    """Dilated-conv context refinement at full resolution."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for i, (ch, dil) in enumerate(((32, 1), (32, 2), (32, 4))):
            x = _leaky(_conv(ch, dilation=dil, name=f"ctx{i}",
                             dtype=self.dtype)(x))
        return _conv(2, name="ctx_flow", dtype=self.dtype)(x)


class AlignLiteNet(nn.Module):
    """``(source, target) -> flow [..., H, W, 2]`` in input px such that
    ``target(p) ~= source(p + flow(p))``. H and W must be multiples
    of 4. With ``return_pyramid=True`` also returns the per-level flows
    (each in its own grid's px) for multi-scale supervision."""
    dtype: Any = None

    @nn.compact
    def __call__(self, source_img, target_img, return_pyramid: bool = False,
                 target_repeat: int = 1):
        """``target_repeat > 1`` declares that every ``target_repeat``
        consecutive sources share ONE target (the burst case: N-1 frames
        vs a single reference): ``target_img``'s leading size is then
        ``sources / target_repeat`` and its feature pyramid is extracted
        ONCE per unique target and broadcast — numerically identical to
        pre-broadcasting the image (the extractor is siamese and every
        downstream op is per-pair), but skips the redundant extractor
        passes XLA cannot dedupe."""
        assert source_img.shape[-3:] == target_img.shape[-3:]
        lead = source_img.shape[:-3]
        H, W = source_img.shape[-3], source_img.shape[-2]
        assert H % 4 == 0 and W % 4 == 0, (H, W)
        src = source_img.reshape((-1, H, W) + source_img.shape[-1:])
        tgt = target_img.reshape((-1, H, W) + target_img.shape[-1:])
        assert tgt.shape[0] * target_repeat == src.shape[0], (
            src.shape, tgt.shape, target_repeat)

        extractor = LiteExtractor(name="extractor", dtype=self.dtype)
        f_src = extractor(src)
        f_tgt = extractor(tgt)
        if target_repeat > 1:
            f_tgt = [jnp.repeat(f, target_repeat, axis=0) for f in f_tgt]

        pyramid = {}
        flow = None
        for lvl in (2, 1, 0):
            if flow is not None:
                lh, lw = f_tgt[lvl].shape[-3:-1]
                # x2: coarser-grid px -> this grid's px
                flow = resize_bilinear(flow, (lh, lw)) * 2.0
            flow, feat = LiteDecoder(lvl, name=f"dec{lvl}",
                                     dtype=self.dtype)(
                f_tgt[lvl], f_src[lvl], flow)
            pyramid[lvl] = flow
        flow = flow + LiteRefiner(name="refiner", dtype=self.dtype)(
            jnp.concatenate([feat, flow], axis=-1))
        pyramid[0] = flow  # supervise the refined full-res flow

        flow = flow.astype(jnp.float32).reshape(lead + (H, W, 2))
        if return_pyramid:
            pyramid = {lvl: f.astype(jnp.float32).reshape(
                lead + f.shape[-3:]) for lvl, f in pyramid.items()}
            return flow, {"pyramid": pyramid}
        return flow


class BurstAlignLite(nn.Module):
    """Standalone burst->flow wrapper for AlignLite pretraining.

    Reproduces the DBSR aligner's exact input contract (demosaiced
    packed burst, frames 1..N-1 against frame 0, identical to
    ``dbsr.AlignedEncoder``) with the inner module named
    ``alignment_net`` so a checkpoint grafts directly into
    ``DBSRNet(flow_net='lite')``'s ``encoder/alignment_net`` subtree —
    the same graft protocol as ``models.pwcnet.BurstFlowNet``.

    ``__call__(burst [B, N, h, w, 4]) -> flow [B, N-1, h, w, 2]`` in
    packed-grid px.
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
        net = AlignLiteNet(name="alignment_net", dtype=self.dtype)
        if return_pyramid:
            flow, aux = net(flat(oth), ref, return_pyramid=True,
                            target_repeat=N - 1)
            return flow.reshape((B, N - 1) + flow.shape[-3:]), aux
        flow = net(flat(oth), ref, target_repeat=N - 1)
        return flow.reshape((B, N - 1) + flow.shape[-3:])


def coarse_to_fine_flow(apply_fn, source, target, scales=(4, 1)):
    """Apply a short-range flow net coarse-to-fine across image SCALES.

    AlignLite is trained at burst-SR pitch (48x48 packed frames); fed
    SCA-sized full-RGB images (e.g. 640^2 BurstSR pred->GT) directly it
    underestimates large displacements (measured: ~20% of a 7 px shift).
    Estimating at 1/4 scale puts both the displacement and the content
    pitch near its training regime; optional finer passes estimate the
    residual against the coarse-warped source (flows compose additively
    — the standard coarse-to-fine approximation).

    ``apply_fn(source, target) -> flow`` at any mult-of-4 size;
    ``scales`` are downscale factors, coarsest first, each dividing the
    input size. Returns full-resolution flow in input px.
    """
    from dbsr_tpu.ops.interp import backwarp_auto, resize_bilinear

    H, W = source.shape[-3], source.shape[-2]
    flow = None
    for s in scales:
        hw = (H // s, W // s)
        src = source if s == 1 else resize_bilinear(source, hw)
        tgt = target if s == 1 else resize_bilinear(target, hw)
        if flow is None:
            flow = resize_bilinear(apply_fn(src, tgt), (H, W)) * float(s)
        else:
            flow_s = resize_bilinear(flow, hw) / float(s)
            residual = apply_fn(backwarp_auto(src, flow_s), tgt)
            flow = flow + resize_bilinear(residual, (H, W)) * float(s)
    return flow
