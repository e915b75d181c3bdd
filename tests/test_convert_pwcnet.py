"""PWC-Net torch-weight conversion: shape compatibility + numerical parity
of the converted tree against a synthetic torch-style state dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbsr_tpu.models.pwcnet import PWCFlowNet
from dbsr_tpu.utils.convert_pwcnet import convert_pwcnet_state_dict


def _fake_torch_state_dict(rng):
    """Build a sniklaus-format state dict with random values and the exact
    released shapes."""
    sd = {}

    def conv(key, cin, cout, k=3):
        sd[f"{key}.weight"] = (0.02 * rng.randn(cout, cin, k, k)).astype(np.float32)
        sd[f"{key}.bias"] = (0.02 * rng.randn(cout)).astype(np.float32)

    def tconv(key, cin, cout):
        sd[f"{key}.weight"] = (0.02 * rng.randn(cin, cout, 4, 4)).astype(np.float32)
        sd[f"{key}.bias"] = (0.02 * rng.randn(cout)).astype(np.float32)

    ext_ch = [(3, 16), (16, 32), (32, 64), (64, 96), (96, 128), (128, 196)]
    names = ["netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"]
    for (cin, cout), n in zip(ext_ch, names):
        conv(f"net.netExtractor.{n}.0", cin, cout)
        conv(f"net.netExtractor.{n}.2", cout, cout)
        conv(f"net.netExtractor.{n}.4", cout, cout)

    prev_feat = {2: 81 + 32 + 2 + 2, 3: 81 + 64 + 2 + 2, 4: 81 + 96 + 2 + 2,
                 5: 81 + 128 + 2 + 2, 6: 81}
    dec_names = {2: "netTwo", 3: "netThr", 4: "netFou", 5: "netFiv",
                 6: "netSix"}
    for lvl in (6, 5, 4, 3, 2):
        base = f"net.{dec_names[lvl]}"
        cur = prev_feat[lvl]
        if lvl < 6:
            upfeat_in = prev_feat[lvl + 1] + 128 + 128 + 96 + 64 + 32
            tconv(f"{base}.netUpflow", 2, 2)
            tconv(f"{base}.netUpfeat", upfeat_in, 2)
        c = cur
        for dname, cout in zip(
                ("netOne", "netTwo", "netThr", "netFou", "netFiv"),
                (128, 128, 96, 64, 32)):
            conv(f"{base}.{dname}.0", c, cout)
            c += cout
        conv(f"{base}.netSix.0", c, 2)

    ref_in = 81 + 32 + 2 + 2 + 128 + 128 + 96 + 64 + 32
    ch = [(ref_in, 128, 1), (128, 128, 2), (128, 128, 4), (128, 96, 8),
          (96, 64, 16), (64, 32, 1)]
    for i, (cin, cout, dil) in enumerate(ch):
        conv(f"net.netRefiner.netMain.{2 * i}", cin, cout)
    conv("net.netRefiner.netMain.12", 32, 2)
    return sd


def test_converted_tree_matches_flax_init_shapes():
    rng = np.random.RandomState(0)
    sd = _fake_torch_state_dict(rng)
    converted = convert_pwcnet_state_dict(sd)

    net = PWCFlowNet()
    a = jnp.zeros((1, 64, 64, 3))
    ref = net.init(jax.random.key(0), a, a)["params"]

    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    conv_flat = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, converted))[0]
    ref_shapes = {jax.tree_util.keystr(p): tuple(v.shape)
                  for p, v in ref_flat}
    conv_shapes = {jax.tree_util.keystr(p): tuple(v.shape)
                   for p, v in conv_flat}
    assert ref_shapes == conv_shapes


def test_converted_net_runs_and_matches_value_mapping():
    """Spot-check one conv's values survive the transpose mapping."""
    rng = np.random.RandomState(1)
    sd = _fake_torch_state_dict(rng)
    converted = convert_pwcnet_state_dict(sd)

    w_torch = sd["net.netExtractor.netOne.0.weight"]  # [16, 3, 3, 3]
    w_ours = np.asarray(converted["extractor"]["lvl1_conv0"]["Conv_0"][
        "kernel"])  # [3, 3, 3, 16]
    np.testing.assert_array_equal(w_ours, w_torch.transpose(2, 3, 1, 0))

    net = PWCFlowNet()
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    flow = net.apply({"params": jax.tree.map(jnp.asarray, converted)}, a, a)
    assert flow.shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(flow)).all()
