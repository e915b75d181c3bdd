"""Convert pretrained PWC-Net torch weights to our flax parameter tree.

The reference always loads the sniklaus pytorch-pwc pretrained checkpoint
(`models/dbsr/dbsrnet.py:59-60`, downloaded by ``install.sh``). This module
maps that state dict (torch tensors or numpy arrays) onto the parameter
tree of ``dbsr_tpu.models.pwcnet.PWCFlowNet`` so eval-parity experiments
can reuse the released flow weights when they are available on disk.

Layout rules:
  * conv weights: torch ``[out, in, kh, kw]`` -> HWIO ``[kh, kw, in, out]``;
  * transposed-conv weights: torch ``[in, out, kh, kw]`` ->
    ``[kh, kw, in, out]`` (our ``TorchConvTranspose`` flips spatially at
    apply time, reproducing torch semantics exactly — verified against
    torch in tests/test_models.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# torch module name -> (our module path, is_transposed)
_EXTRACTOR_LEVELS = ["netOne", "netTwo", "netThr", "netFou", "netFiv",
                     "netSix"]
_DECODER_NAMES = {"netTwo": "dec2", "netThr": "dec3", "netFou": "dec4",
                  "netFiv": "dec5", "netSix": "dec6"}
_DENSE = ["netOne", "netTwo", "netThr", "netFou", "netFiv"]


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _tconv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 0, 1)


def convert_pwcnet_state_dict(sd: Dict) -> Dict:
    """torch state dict (``net.netExtractor...`` keys, 'module'->'net'
    already normalized or not) -> flax params dict for ``PWCFlowNet``."""
    sd = {k.replace("module", "net"): v for k, v in sd.items()}

    def cw(key):
        return _conv(sd[f"{key}.weight"])

    def cb(key):
        return _np(sd[f"{key}.bias"])

    params: Dict = {}

    # extractor: each level is Sequential(conv, lrelu, conv, lrelu, conv,
    # lrelu) -> indices 0, 2, 4
    extractor = {}
    for lvl, name in enumerate(_EXTRACTOR_LEVELS, start=1):
        for j, seq_idx in enumerate((0, 2, 4)):
            key = f"net.netExtractor.{name}.{seq_idx}"
            extractor[f"lvl{lvl}_conv{j}"] = {
                "Conv_0": {"kernel": cw(key), "bias": cb(key)}}
    params["extractor"] = extractor

    # decoders
    for tname, oname in _DECODER_NAMES.items():
        dec = {}
        base = f"net.{tname}"
        if f"{base}.netUpflow.weight" in sd:
            dec["upflow"] = {
                "kernel": _tconv(sd[f"{base}.netUpflow.weight"]),
                "bias": _np(sd[f"{base}.netUpflow.bias"])}
            dec["upfeat"] = {
                "kernel": _tconv(sd[f"{base}.netUpfeat.weight"]),
                "bias": _np(sd[f"{base}.netUpfeat.bias"])}
        for i, dname in enumerate(_DENSE):
            key = f"{base}.{dname}.0"
            dec[f"dense{i}"] = {
                "Conv_0": {"kernel": cw(key), "bias": cb(key)}}
        key = f"{base}.netSix.0"
        dec["flow_head"] = {"Conv_0": {"kernel": cw(key), "bias": cb(key)}}
        params[oname] = dec

    # refiner: Sequential conv indices 0,2,4,6,8,10 + final 12
    refiner = {}
    for i, seq_idx in enumerate((0, 2, 4, 6, 8, 10)):
        key = f"net.netRefiner.netMain.{seq_idx}"
        refiner[f"ctx{i}"] = {
            "Conv_0": {"kernel": cw(key), "bias": cb(key)}}
    key = "net.netRefiner.netMain.12"
    refiner["ctx_flow"] = {"Conv_0": {"kernel": cw(key), "bias": cb(key)}}
    params["refiner"] = refiner

    return params


def load_pwcnet_torch_checkpoint(path: str) -> Dict:
    """Load a torch ``.pth`` checkpoint file and convert. Returns a params
    dict suitable for ``PWCNet`` (nested under ``{"params": {"net": ...}}``
    when applying the wrapper module)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_pwcnet_state_dict(sd)
