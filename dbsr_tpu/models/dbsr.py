"""DBSR network: encoder + alignment, attention fusion, pixel-shuffle decoder.

TPU-native re-design of reference ``models/dbsr/{encoders,merging,decoders,
dbsrnet}.py``. Layout is NHWC with the burst-frame axis kept explicit:
``burst`` is ``[B, N, h, w, 4]`` packed RGGB; frames are flattened into the
batch dim for per-frame convs (large batched convs keep the MXU busy), and
the fusion softmax reduces over the frame axis.

The default configuration (``dbsr_default_config``) mirrors
``train_settings/dbsr/default_synthetic.py:73-82``: enc 64ch/9 ResBlocks/512
out, dec 64/5-pre/32/4-post, x8 upsampling with ICNR + gauss(sd=1.0), offset
feat 64, weight-proj 64, 3 weight-predictor ResBlocks, frozen flow net.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dbsr_tpu.models.layers import (ConvBlock, PixShuffleUpsampler,
                                    ResBlock, depth_to_space_phase_major)
from dbsr_tpu.models.pwcnet import PWCNet
from dbsr_tpu.ops.camera import demosaic_naive
from dbsr_tpu.ops.warp_pallas import warp_auto as warp


def _flatten_frames(x):
    """[B, N, h, w, c] -> [B*N, h, w, c]"""
    return x.reshape((-1,) + x.shape[-3:])


class ResEncoder(nn.Module):
    """Per-frame embedding stack: conv -> num_res_blocks x ResBlock -> conv
    (reference ``encoders.py:36-46,66-71``)."""
    init_dim: int = 64
    num_res_blocks: int = 9
    out_dim: int = 512
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = ConvBlock(self.init_dim, 3, activation=self.activation,
                      dtype=d)(x)
        for _ in range(self.num_res_blocks):
            x = ResBlock(self.init_dim, activation=self.activation,
                         dtype=d)(x)
        return ConvBlock(self.out_dim, 3, activation=self.activation,
                         dtype=d)(x)


class ConvFlow(nn.Module):
    """Minimal learned flow stub (two convs -> 2-channel flow).

    Drop-in replacement for PWC-Net when the full pyramid is overkill:
    structural tests of alignment/sharding paths (PWC's shard_map compile
    alone costs ~15 min on a 1-core CPU backend) and flow-net ablations.
    Not a parity component."""
    dtype: Any = None

    @nn.compact
    def __call__(self, source_img, target_img):
        x = jnp.concatenate([source_img, target_img], axis=-1)
        x = ConvBlock(8, 3, activation="relu", dtype=self.dtype)(x)
        return ConvBlock(2, 3, activation="none", dtype=self.dtype)(
            x).astype(jnp.float32)


class AlignedEncoder(nn.Module):
    """Encode burst frames and warp non-reference embeddings to the
    reference frame using PWC-Net flow (reference
    ``ResEncoderWarpAlignnet``, ``encoders.py:21-87``).

    Returns dict with ``ref_feat`` ``[B, N-1, h, w, C]`` (broadcast),
    ``oth_feat`` (flow-warped), and ``offsets`` ``[B, N-1, h, w, 2]``.
    When ``train_alignment`` is False the flow is computed under
    ``stop_gradient`` (the reference wraps the aligner in no_grad + eval,
    ``encoders.py:56-61``). ``flow_net`` selects the aligner:
    ``'pwc'`` (reference parity), ``'lite'`` (``models.align_lite`` —
    the trainable-here aligner, see its module docstring), ``'conv'``
    (``ConvFlow`` stub, tests/ablations only).
    """
    init_dim: int = 64
    num_res_blocks: int = 9
    out_dim: int = 512
    activation: str = "relu"
    train_alignment: bool = False
    dtype: Any = None
    flow_net: str = "pwc"

    @nn.compact
    def __call__(self, burst):
        assert burst.ndim == 5, "expected [B, N, h, w, 4] packed burst"
        B, N = burst.shape[0], burst.shape[1]

        # pseudo-RGB for the flow net (reference encoders.py:52)
        rgb = demosaic_naive(burst)
        oth = rgb[:, 1:]

        if self.flow_net == "pwc":
            flow_cls = PWCNet
        elif self.flow_net == "lite":
            from dbsr_tpu.models.align_lite import AlignLiteNet
            flow_cls = AlignLiteNet
        else:
            flow_cls = ConvFlow
        if self.flow_net in ("pwc", "lite"):
            # the reference frame is ONE image per burst: hand it to the
            # flow net unbroadcast so the siamese extractor runs once per
            # burst instead of N-1 times (pyramid broadcast inside —
            # numerically identical, see AlignLiteNet/PWCFlowNet)
            flow = flow_cls(name="alignment_net", dtype=self.dtype)(
                _flatten_frames(oth), rgb[:, 0], target_repeat=N - 1)
        else:
            ref = jnp.broadcast_to(rgb[:, :1], (B, N - 1) + rgb.shape[-3:])
            flow = flow_cls(name="alignment_net", dtype=self.dtype)(
                _flatten_frames(oth), _flatten_frames(ref))
        if not self.train_alignment:
            flow = jax.lax.stop_gradient(flow)

        feat = ResEncoder(self.init_dim, self.num_res_blocks, self.out_dim,
                          self.activation, dtype=self.dtype, name="embed")(
            _flatten_frames(burst))
        feat = feat.reshape((B, N) + feat.shape[-3:])

        ref_feat = feat[:, :1]
        oth_feat = _flatten_frames(feat[:, 1:])
        oth_feat = warp(oth_feat, flow)
        oth_feat = oth_feat.reshape((B, N - 1) + oth_feat.shape[-3:])
        ref_feat = jnp.broadcast_to(ref_feat,
                                    (B, N - 1) + ref_feat.shape[-3:])
        offsets = flow.reshape((B, N - 1) + flow.shape[-3:])
        return {"ref_feat": ref_feat, "oth_feat": oth_feat,
                "offsets": offsets}


class WeightedSumMerge(nn.Module):
    """Attention-weighted burst fusion (reference ``merging.py:21-127``).

    Projects embeddings to ``project_dim``, computes residuals against a
    base (reference-frame projection by default), embeds sub-pixel flow
    offsets (mod ``offset_modulo``), predicts per-pixel per-frame logits
    over ``input_dim`` channels, softmax-normalizes over the frame axis and
    fuses with a weighted sum.
    """
    input_dim: int = 512
    project_dim: int = 64
    offset_feat_dim: int = 64
    num_offset_feat_extractor_res: int = 1
    num_weight_predictor_res: int = 3
    use_offset: bool = True
    offset_modulo: Optional[float] = 1.0
    softmax: bool = True
    use_base_frame: bool = True
    # Uniform noise amplitude on the reference frame's (zero) offsets so the
    # net cannot key on "offset == exactly 0" to find the reference frame
    # (reference ``merging.py:92-99``). Active only when an ``offset_noise``
    # RNG stream is supplied to ``apply`` (train passes it, eval doesn't).
    ref_offset_noise: float = 0.0
    activation: str = "relu"
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, return_logits: bool = False):
        ref_feat = inputs["ref_feat"][:, :1]  # [B, 1, h, w, C]
        oth_feat = inputs["oth_feat"]
        offsets = inputs["offsets"]
        B = ref_feat.shape[0]
        hw = ref_feat.shape[-3:-1]

        all_feat = jnp.concatenate([ref_feat, oth_feat], axis=1)
        N = all_feat.shape[1]

        proj = ConvBlock(self.project_dim, 1, activation=self.activation,
                         dtype=self.dtype,
                         name="feat_project")(_flatten_frames(all_feat))
        proj = proj.reshape((B, N) + proj.shape[-3:])

        if self.use_base_frame:
            base = proj[:, :1]
        else:
            base = proj.mean(axis=1, keepdims=True)

        diff = _flatten_frames(proj - base)
        base_b = _flatten_frames(
            jnp.broadcast_to(base, (B, N) + base.shape[-3:]))

        pred_in = [base_b, diff]
        if self.use_offset:
            if self.ref_offset_noise > 0.0 and self.has_rng("offset_noise"):
                offsets_base = jax.random.uniform(
                    self.make_rng("offset_noise"), (B, 1) + hw + (2,),
                    offsets.dtype, -self.ref_offset_noise,
                    self.ref_offset_noise)
            else:
                offsets_base = jnp.zeros((B, 1) + hw + (2,), offsets.dtype)
            offs = jnp.concatenate([offsets_base, offsets], axis=1)
            offs = _flatten_frames(offs)
            if self.offset_modulo is not None:
                offs = offs % self.offset_modulo
            x = ConvBlock(self.offset_feat_dim, 3,
                          activation=self.activation, dtype=self.dtype,
                          name="offset_conv")(offs)
            for i in range(self.num_offset_feat_extractor_res):
                x = ResBlock(self.offset_feat_dim,
                             activation=self.activation, dtype=self.dtype,
                             name=f"offset_res{i}")(x)
            pred_in.append(x)

        x = jnp.concatenate(pred_in, axis=-1)
        x = ConvBlock(2 * self.project_dim, 3, activation=self.activation,
                      dtype=self.dtype, name="weight_conv")(x)
        for i in range(self.num_weight_predictor_res):
            x = ResBlock(2 * self.project_dim, activation=self.activation,
                         dtype=self.dtype, name=f"weight_res{i}")(x)
        logits = ConvBlock(self.input_dim, 3, activation="none",
                           dtype=self.dtype, name="weight_out")(x)
        logits = logits.reshape((B, N) + logits.shape[-3:])

        if return_logits:
            # pre-normalization outputs for frame-sharded fusion
            # (dbsr_tpu/parallel/frame_sharding.py): the softmax-sum over
            # the GLOBAL frame axis is then computed with psum collectives.
            return {"all_feat": all_feat, "logits": logits}

        if self.softmax:
            weights = jax.nn.softmax(logits, axis=1)
            # One-pass Pallas softmax-sum on TPU (ops/merge_pallas.py):
            # avoids materializing [B, N, h, w, C] weights to HBM. The
            # `weights` expression above still defines `fusion_weights`;
            # when the caller ignores it (training) XLA dead-code-
            # eliminates the separate softmax entirely.
            from dbsr_tpu.ops.merge_pallas import merge_auto
            fused = merge_auto(all_feat, logits)
        else:
            w = nn.relu(logits)
            weights = w / (w.sum(axis=1, keepdims=True) + 1e-12)
            fused = (all_feat * weights).sum(axis=1)
        return {"fused_enc": fused, "fusion_weights": weights}


class PixShuffleDecoder(nn.Module):
    """Residual decoder with sub-pixel upsampling (reference
    ``decoders.py:20-62``): conv -> pre ResBlocks -> PixShuffle x r ->
    post ResBlocks -> 1x1 conv to linear RGB."""
    init_conv_dim: int = 64
    num_pre_res_blocks: int = 5
    post_conv_dim: int = 32
    num_post_res_blocks: int = 4
    upsample_factor: int = 8
    icnrinit: bool = True
    gauss_blur_sd: Optional[float] = 1.0
    gauss_ksz: int = 3
    activation: str = "relu"
    # The reference's final predictor is conv_block with the DEFAULT
    # activation — i.e. the output RGB is ReLU'd (``decoders.py:52`` +
    # ``blocks.py:46`` default activation='relu'). Matched here; verified
    # by the full-network torch-oracle parity test.
    final_activation: str = "relu"
    dtype: Any = None
    # Run the post-shuffle stage in space-to-depth space (exact transform,
    # same params; ~1.5x faster on TPU for the 32-channel 384^2 stage —
    # see models/layers.py s2d_conv_kernel). Checkpoints are independent
    # of this flag.
    fused_s2d: bool = False

    @nn.compact
    def __call__(self, fused):
        d = self.dtype
        x = ConvBlock(self.init_conv_dim, 3, activation=self.activation,
                      dtype=d)(fused)
        for _ in range(self.num_pre_res_blocks):
            x = ResBlock(self.init_conv_dim, activation=self.activation,
                         dtype=d)(x)
        s2d = self.fused_s2d and self.upsample_factor % 2 == 0
        x = PixShuffleUpsampler(
            self.post_conv_dim, self.upsample_factor,
            activation=self.activation, icnrinit=self.icnrinit,
            gauss_blur_sd=self.gauss_blur_sd, gauss_ksz=self.gauss_ksz,
            dtype=d, s2d_output=s2d)(x)
        for _ in range(self.num_post_res_blocks):
            x = ResBlock(self.post_conv_dim, activation=self.activation,
                         dtype=d, s2d=s2d)(x)
        x = ConvBlock(3, 1, activation=self.final_activation, dtype=d,
                      s2d=s2d)(x)
        if s2d:
            x = depth_to_space_phase_major(x, 2)
        return x


class DBSRNet(nn.Module):
    """Full burst SR network (reference ``dbsrnet.py:24-38``): returns
    ``(pred [B, rH, rW, 3], aux)`` with aux = offsets + fusion weights."""
    enc_init_dim: int = 64
    enc_num_res_blocks: int = 9
    enc_out_dim: int = 512
    dec_init_conv_dim: int = 64
    dec_num_pre_res_blocks: int = 5
    dec_post_conv_dim: int = 32
    dec_num_post_res_blocks: int = 4
    upsample_factor: int = 8
    offset_feat_dim: int = 64
    weight_pred_proj_dim: int = 64
    num_offset_feat_extractor_res: int = 1
    num_weight_predictor_res: int = 3
    offset_modulo: Optional[float] = 1.0
    use_offset: bool = True
    softmax: bool = True
    use_base_frame: bool = True
    ref_offset_noise: float = 0.0
    final_activation: str = "relu"  # see PixShuffleDecoder.final_activation
    icnrinit: bool = True
    gauss_blur_sd: Optional[float] = 1.0
    gauss_ksz: int = 3
    activation: str = "relu"
    train_alignment: bool = False
    dtype: Any = None  # compute dtype; None = promote (f32 params -> f32)
    fused_s2d_decoder: bool = False
    flow_net: str = "pwc"  # 'lite' = AlignLiteNet; 'conv' = test stub

    @nn.compact
    def __call__(self, burst):
        enc = AlignedEncoder(
            self.enc_init_dim, self.enc_num_res_blocks, self.enc_out_dim,
            self.activation, self.train_alignment, self.dtype,
            self.flow_net, name="encoder")(burst)
        merged = WeightedSumMerge(
            self.enc_out_dim, self.weight_pred_proj_dim,
            self.offset_feat_dim, self.num_offset_feat_extractor_res,
            self.num_weight_predictor_res, self.use_offset,
            self.offset_modulo, self.softmax, self.use_base_frame,
            self.ref_offset_noise, self.activation, self.dtype,
            name="merging")(enc)
        pred = PixShuffleDecoder(
            self.dec_init_conv_dim, self.dec_num_pre_res_blocks,
            self.dec_post_conv_dim, self.dec_num_post_res_blocks,
            self.upsample_factor, self.icnrinit, self.gauss_blur_sd,
            self.gauss_ksz, self.activation, self.final_activation,
            self.dtype, self.fused_s2d_decoder, name="decoder")(
            merged["fused_enc"])
        # predictions in f32 for losses/metrics regardless of compute dtype
        return pred.astype(jnp.float32), {
            "offsets": enc["offsets"],
            "fusion_weights": merged["fusion_weights"]}


def dbsrnet_cvpr2021(**overrides) -> DBSRNet:
    """Factory matching the reference default synthetic config
    (``train_settings/dbsr/default_synthetic.py:73-82``)."""
    return DBSRNet(**overrides)


def dbsrnet_tiny(**overrides) -> DBSRNet:
    """Small config for tests / dry runs."""
    cfg = dict(enc_init_dim=8, enc_num_res_blocks=1, enc_out_dim=16,
               dec_init_conv_dim=8, dec_num_pre_res_blocks=1,
               dec_post_conv_dim=8, dec_num_post_res_blocks=1,
               upsample_factor=8, offset_feat_dim=4, weight_pred_proj_dim=4,
               num_weight_predictor_res=1)
    cfg.update(overrides)
    return DBSRNet(**cfg)
