"""Convert a reference (torch) DBSRNet state dict to our flax param tree.

Enables (a) loading the published CVPR2021 checkpoints when they are staged
(zero-egress blocks downloading them here) and (b) full-network numerical
parity tests against a CPU torch oracle built from the mounted reference
source (``models/dbsr/{encoders,merging,decoders}.py``).

Key layout mapped (reference -> ours):
  encoder.init_layer.0            -> encoder/embed/ConvBlock_0
  encoder.res_layers.{i}.conv{1,2}.0 -> encoder/embed/ResBlock_{i}/ConvBlock_{0,1}
  encoder.out_layer.0             -> encoder/embed/ConvBlock_1
  encoder.alignment_net.net.*     -> encoder/alignment_net/net/* (via
                                     convert_pwcnet_state_dict)
  merging.feat_project_layer.0    -> merging/feat_project
  merging.offset_feat_extractor.0.0 -> merging/offset_conv
  merging.offset_feat_extractor.{1+i} -> merging/offset_res{i}
  merging.weight_predictor.0.0    -> merging/weight_conv
  merging.weight_predictor.{1+i}  -> merging/weight_res{i}
  merging.weight_predictor.{last}.0 -> merging/weight_out
  decoder.init_layer.0            -> decoder/ConvBlock_0
  decoder.pre_res_layers.{i}      -> decoder/ResBlock_{i}
  decoder.upsample_layer.conv_layer.0 -> decoder/PixShuffleUpsampler_0/Conv_0
  decoder.post_res_layers.{i}     -> decoder/ResBlock_{n_pre+i}
  decoder.predictor.0             -> decoder/ConvBlock_1

Conv weights transpose torch OIHW -> HWIO. Block counts are derived from
the state-dict keys, so any reference config converts.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from dbsr_tpu.utils.convert_pwcnet import convert_pwcnet_state_dict


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_w(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _conv_entry(sd: Dict, key: str) -> Dict:
    out = {"kernel": _conv_w(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return {"Conv_0": out}


def _res_entry(sd: Dict, base: str) -> Dict:
    return {"ConvBlock_0": _conv_entry(sd, f"{base}.conv1.0"),
            "ConvBlock_1": _conv_entry(sd, f"{base}.conv2.0")}


def _count(sd: Dict, pattern: str) -> int:
    """Number of matching blocks. Uses len (indices are contiguous but may
    start at 1 inside Sequentials whose first entry is a conv block)."""
    rx = re.compile(pattern)
    return len({int(m.group(1)) for k in sd if (m := rx.match(k))})


def convert_dbsr_state_dict(sd: Dict) -> Dict:
    """Reference DBSRNet ``state_dict()`` -> flax params (the value for
    ``{"params": ...}``)."""
    sd = {k: v for k, v in sd.items()}

    # --- encoder ---------------------------------------------------------
    embed = {"ConvBlock_0": _conv_entry(sd, "encoder.init_layer.0")}
    n_enc_res = _count(sd, r"encoder\.res_layers\.(\d+)\.conv1\.0\.weight")
    for i in range(n_enc_res):
        embed[f"ResBlock_{i}"] = _res_entry(sd, f"encoder.res_layers.{i}")
    embed["ConvBlock_1"] = _conv_entry(sd, "encoder.out_layer.0")

    pwc_sd = {k[len("encoder.alignment_net."):]: v for k, v in sd.items()
              if k.startswith("encoder.alignment_net.")}
    encoder = {"embed": embed,
               "alignment_net": {"net": convert_pwcnet_state_dict(pwc_sd)}}

    # --- merging ---------------------------------------------------------
    merging = {
        "feat_project": _conv_entry(sd, "merging.feat_project_layer.0")}
    if "merging.offset_feat_extractor.0.0.weight" in sd:
        merging["offset_conv"] = _conv_entry(
            sd, "merging.offset_feat_extractor.0.0")
        n_off = _count(
            sd, r"merging\.offset_feat_extractor\.(\d+)\.conv1\.0\.weight")
        for i in range(n_off):
            merging[f"offset_res{i}"] = _res_entry(
                sd, f"merging.offset_feat_extractor.{i + 1}")
    merging["weight_conv"] = _conv_entry(sd, "merging.weight_predictor.0.0")
    n_w = _count(sd, r"merging\.weight_predictor\.(\d+)\.conv1\.0\.weight")
    for i in range(n_w):
        merging[f"weight_res{i}"] = _res_entry(
            sd, f"merging.weight_predictor.{i + 1}")
    merging["weight_out"] = _conv_entry(
        sd, f"merging.weight_predictor.{n_w + 1}.0")

    # --- decoder ---------------------------------------------------------
    decoder = {"ConvBlock_0": _conv_entry(sd, "decoder.init_layer.0")}
    n_pre = _count(sd, r"decoder\.pre_res_layers\.(\d+)\.conv1\.0\.weight")
    for i in range(n_pre):
        decoder[f"ResBlock_{i}"] = _res_entry(
            sd, f"decoder.pre_res_layers.{i}")
    decoder["PixShuffleUpsampler_0"] = _conv_entry(
        sd, "decoder.upsample_layer.conv_layer.0")
    n_post = _count(sd, r"decoder\.post_res_layers\.(\d+)\.conv1\.0\.weight")
    for i in range(n_post):
        decoder[f"ResBlock_{n_pre + i}"] = _res_entry(
            sd, f"decoder.post_res_layers.{i}")
    decoder["ConvBlock_1"] = _conv_entry(sd, "decoder.predictor.0")

    return {"encoder": encoder, "merging": merging, "decoder": decoder}


def load_dbsr_torch_checkpoint(path: str) -> Dict:
    """Load a reference ``.pth.tar`` training checkpoint (as written by
    ``trainers/base_trainer.py:92-122``) and convert its net weights."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    return convert_dbsr_state_dict(sd)
