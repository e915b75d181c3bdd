"""Full-network numerical parity against a CPU torch oracle built from the
mounted reference source (VERDICT round-1 item 3).

Constructs the REFERENCE DBSRNet/PWCNet (``/root/reference/models/...``)
with random torch init, converts the weights to our flax tree
(``dbsr_tpu/utils/convert_dbsr.py``), and asserts end-to-end outputs match.
This proves the 39.1 dB parity target cannot be lost to architecture or
layout bugs — only to training.

The reference's CUDA correlation (cupy) is unavailable; a pure-torch
shifted-window implementation with identical semantics (validated channel
order, tests/test_correlation.py) is injected as the ``correlation``
module before importing the reference pwcnet.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _torch_function_correlation(tenFirst=None, tenSecond=None, max_disp=4):
    t1, t2 = tenFirst, tenSecond
    """Pure-torch cost volume matching the reference CUDA kernel
    (``external/pwcnet/correlation/correlation.py:35-103``): channel
    c = (dy+4)*9 + (dx+4), dot product / C, zero padding. Keyword names
    match the reference call site (``pwcnet.py:161``)."""
    B, C, H, W = t1.shape
    p = max_disp
    t2p = F.pad(t2, (p, p, p, p))
    outs = []
    for dy in range(-p, p + 1):
        for dx in range(-p, p + 1):
            shifted = t2p[:, :, p + dy:p + dy + H, p + dx:p + dx + W]
            outs.append((t1 * shifted).mean(dim=1))
    return torch.stack(outs, dim=1)


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference model modules with a fake correlation module
    (cupy is not installed) and /root/reference on sys.path."""
    fake = types.ModuleType("correlation")
    fake.FunctionCorrelation = _torch_function_correlation
    for name in ("external", "external.pwcnet", "external.pwcnet.correlation"):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        mod.__path__ = []  # mark as package
    sys.modules["external.pwcnet.correlation"].correlation = fake
    sys.modules["external.pwcnet.correlation.correlation"] = fake

    sys.path.insert(0, REF)
    try:
        import models.alignment.pwcnet as ref_pwc
        import models.dbsr.decoders as ref_dec
        import models.dbsr.encoders as ref_enc
        import models.dbsr.merging as ref_mrg
    finally:
        sys.path.remove(REF)
    return ref_pwc, ref_enc, ref_mrg, ref_dec


def _to_nhwc(t):
    return np.asarray(t.detach()).transpose(0, 2, 3, 1)


def test_pwcnet_end_to_end_parity(ref_modules):
    """Whole reference PWCNet wrapper (mult-of-64 resize, x20 scale,
    per-axis rescale, ``pwcnet.py:234-281``) vs our flax PWCNet with
    converted weights, at the DBSR eval flow shape (48x48 pseudo-RGB)."""
    ref_pwc = ref_modules[0]
    from dbsr_tpu.models.pwcnet import PWCNet
    from dbsr_tpu.utils.convert_pwcnet import convert_pwcnet_state_dict

    torch.manual_seed(0)
    tnet = ref_pwc.PWCNet(load_pretrained=False)
    tnet.eval()

    rng = np.random.RandomState(0)
    src = rng.rand(3, 3, 48, 48).astype(np.float32)
    tgt = rng.rand(3, 3, 48, 48).astype(np.float32)
    with torch.no_grad():
        flow_t = tnet(torch.tensor(src), torch.tensor(tgt))

    params = {"params": {
        "net": convert_pwcnet_state_dict(tnet.state_dict())}}
    jnet = PWCNet()
    flow_j = jnet.apply(params, jnp.asarray(src.transpose(0, 2, 3, 1)),
                        jnp.asarray(tgt.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(flow_j), _to_nhwc(flow_t),
                               atol=2e-4)


def test_dbsrnet_end_to_end_parity(ref_modules):
    """Whole reference DBSRNet (CVPR2021 default synthetic config,
    ``train_settings/dbsr/default_synthetic.py:73-82`` /
    ``models/dbsr/dbsrnet.py:24-38``) vs our DBSRNet with converted
    weights at the eval shape: 14-frame 48x48 packed RAW -> 384^2 RGB."""
    ref_pwc, ref_enc, ref_mrg, ref_dec = ref_modules
    from dbsr_tpu.models.dbsr import dbsrnet_cvpr2021
    from dbsr_tpu.utils.convert_dbsr import convert_dbsr_state_dict

    cfg = dict(enc_init_dim=64, enc_num_res_blocks=9, enc_out_dim=512,
               dec_init_conv_dim=64, dec_num_pre_res_blocks=5,
               dec_post_conv_dim=32, dec_num_post_res_blocks=4,
               upsample_factor=8, offset_feat_dim=64,
               weight_pred_proj_dim=64, num_offset_feat_extractor_res=1,
               num_weight_predictor_res=3, offset_modulo=1.0,
               use_offset=True, softmax=True, use_base_frame=True,
               icnrinit=True, gauss_blur_sd=1.0, gauss_ksz=3)

    torch.manual_seed(1)
    alignment = ref_pwc.PWCNet(load_pretrained=False)
    encoder = ref_enc.ResEncoderWarpAlignnet(
        cfg["enc_init_dim"], cfg["enc_num_res_blocks"], cfg["enc_out_dim"],
        alignment, activation="relu", train_alignmentnet=False)
    merging = ref_mrg.WeightedSum(
        cfg["enc_out_dim"], cfg["weight_pred_proj_dim"],
        cfg["offset_feat_dim"],
        num_offset_feat_extractor_res=cfg["num_offset_feat_extractor_res"],
        num_weight_predictor_res=cfg["num_weight_predictor_res"],
        offset_modulo=cfg["offset_modulo"], use_offset=cfg["use_offset"],
        softmax=cfg["softmax"], use_base_frame=cfg["use_base_frame"])
    decoder = ref_dec.ResPixShuffleConv(
        cfg["enc_out_dim"], cfg["dec_init_conv_dim"],
        cfg["dec_num_pre_res_blocks"], cfg["dec_post_conv_dim"],
        cfg["dec_num_post_res_blocks"],
        upsample_factor=cfg["upsample_factor"], activation="relu",
        icnrinit=cfg["icnrinit"], gauss_blur_sd=cfg["gauss_blur_sd"],
        gauss_ksz=cfg["gauss_ksz"])

    class TorchDBSR(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder, self.merging, self.decoder = (encoder, merging,
                                                        decoder)

        def forward(self, im):
            out_enc = self.encoder(im)
            out_merge = self.merging(out_enc)
            return self.decoder(out_merge)["pred"]

    tnet = TorchDBSR()
    tnet.eval()

    rng = np.random.RandomState(7)
    burst = rng.rand(1, 14, 4, 48, 48).astype(np.float32)
    with torch.no_grad():
        pred_t = tnet(torch.tensor(burst))

    params = {"params": convert_dbsr_state_dict(tnet.state_dict())}
    jnet = dbsrnet_cvpr2021()
    pred_j, aux = jnet.apply(params,
                             jnp.asarray(burst.transpose(0, 1, 3, 4, 2)))

    assert pred_j.shape == (1, 384, 384, 3)
    np.testing.assert_allclose(np.asarray(pred_j), _to_nhwc(pred_t),
                               atol=5e-4)
