"""LPIPS tests with a synthetic-weights fixture and a torch oracle.

Real AlexNet-LPIPS weights are zero-egress-blocked; these tests validate
the metric's architecture and math with seeded random weights so the
metric is trustworthy the day real weights are staged (reference:
``models/loss/image_quality_v2.py:139-163`` via the ``lpips`` package).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dbsr_tpu.models import lpips as L

def _synthetic_weights():
    """Seeded random weights in the converted .npz layout (deterministic —
    a fresh RNG per call so every fixture sees identical weights)."""
    rng = np.random.RandomState(0)
    w = {}
    in_ch = 3
    for i, (out_ch, k, s, p) in enumerate(L._ALEX_CONVS):
        w[f"conv{i}_w"] = (0.1 * rng.randn(k, k, in_ch, out_ch)
                           ).astype(np.float32)
        w[f"conv{i}_b"] = (0.01 * rng.randn(out_ch)).astype(np.float32)
        in_ch = out_ch
    for i, (out_ch, _, _, _) in enumerate(L._ALEX_CONVS):
        w[f"lin{i}_w"] = np.abs(
            rng.randn(1, 1, out_ch, 1)).astype(np.float32)
    return w


@pytest.fixture(scope="module")
def weights():
    return {k: jnp.asarray(v) for k, v in _synthetic_weights().items()}


@pytest.fixture(scope="module")
def np_weights():
    return _synthetic_weights()


def _img(shape, seed):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_alex_stack_shapes(weights):
    """Channel counts and spatial strides of the 5 feature taps (AlexNet
    features: conv strides 4,1,1,1,1 with maxpool(3,2) after taps 1, 2)."""
    x = jnp.asarray(_img((1, 64, 64, 3), 0))
    taps = L._alex_features(x * 2 - 1, weights)
    shapes = [t.shape for t in taps]
    assert [s[-1] for s in shapes] == [64, 192, 384, 256, 256]
    # 64 -> conv s4 p2 k11 -> 15; pool -> 7; conv k5 p2 -> 7; pool -> 3;
    # three k3 p1 convs keep 3
    assert [s[1] for s in shapes] == [15, 7, 3, 3, 3]


def test_lpips_identical_is_zero(weights):
    x = jnp.asarray(_img((2, 32, 32, 3), 1))
    d = L.lpips_distance(x, x, weights)
    assert abs(float(d)) < 1e-6


def test_lpips_symmetric_and_positive(weights):
    a = jnp.asarray(_img((1, 32, 32, 3), 2))
    b = jnp.asarray(_img((1, 32, 32, 3), 3))
    dab = float(L.lpips_distance(a, b, weights))
    dba = float(L.lpips_distance(b, a, weights))
    assert dab > 0
    np.testing.assert_allclose(dab, dba, rtol=1e-5)


def test_lpips_boundary_ignore(weights):
    """boundary_ignore crops BEFORE feature extraction: corrupting only the
    boundary must not change the score."""
    a = jnp.asarray(_img((1, 48, 48, 3), 4))
    b = jnp.asarray(_img((1, 48, 48, 3), 5))
    a_corrupt = a.at[:, :8, :, :].set(1.0)
    d_clean = float(L.lpips_distance(a, b, weights, boundary_ignore=8))
    d_corrupt = float(
        L.lpips_distance(a_corrupt, b, weights, boundary_ignore=8))
    np.testing.assert_allclose(d_clean, d_corrupt, rtol=1e-6)
    assert d_clean != pytest.approx(
        float(L.lpips_distance(a, b, weights)), rel=1e-3)


def test_lpips_matches_torch_oracle(weights, np_weights):
    """Independent torch implementation of the lpips-package computation
    (scaling layer -> AlexNet relu taps -> unit-normalize -> squared diff
    -> non-negative 1x1 lin -> spatial average -> sum over stages)."""
    a_np = _img((2, 40, 40, 3), 6)
    b_np = _img((2, 40, 40, 3), 7)

    def torch_feats(x):
        x = (x - torch.tensor(L._SHIFT).view(1, 3, 1, 1)) / \
            torch.tensor(L._SCALE).view(1, 3, 1, 1)
        taps = []
        for i, (out_ch, k, s, p) in enumerate(L._ALEX_CONVS):
            w = torch.tensor(np_weights[f"conv{i}_w"]).permute(3, 2, 0, 1)
            b = torch.tensor(np_weights[f"conv{i}_b"])
            x = F.conv2d(x, w, b, stride=s, padding=p)
            x = F.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return taps

    def torch_lpips(a, b):
        a = torch.tensor(a).permute(0, 3, 1, 2) * 2 - 1
        b = torch.tensor(b).permute(0, 3, 1, 2) * 2 - 1
        total = 0.0
        for i, (fa, fb) in enumerate(zip(torch_feats(a), torch_feats(b))):
            na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            lin = torch.tensor(np_weights[f"lin{i}_w"]).permute(3, 2, 0, 1)
            d = F.conv2d(d, lin)
            total = total + d.mean(dim=(1, 2, 3))
        return total.mean().item()

    ours = float(L.lpips_distance(jnp.asarray(a_np), jnp.asarray(b_np),
                                  weights))
    oracle = torch_lpips(a_np, b_np)
    np.testing.assert_allclose(ours, oracle, rtol=2e-4)


def test_load_lpips_from_npz(tmp_path, np_weights, monkeypatch):
    """load_lpips: .npz round-trip, env-var path resolution, jitted fn with
    static boundary_ignore."""
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **np_weights)
    monkeypatch.setenv("DBSR_TPU_LPIPS_WEIGHTS", path)
    fn = L.load_lpips()
    a = jnp.asarray(_img((1, 48, 48, 3), 8))
    b = jnp.asarray(_img((1, 48, 48, 3), 9))
    d0 = float(fn(a, b))
    d40 = float(fn(a, b, 8))  # static boundary_ignore must retrace fine
    assert d0 > 0 and d40 > 0 and d0 != pytest.approx(d40, rel=1e-3)
    # unbatched input
    d_un = float(fn(a[0], b[0]))
    np.testing.assert_allclose(d_un, d0, rtol=1e-5)


def test_load_lpips_missing_raises(monkeypatch, tmp_path):
    monkeypatch.delenv("DBSR_TPU_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setenv("DBSR_TPU_ENV",
                       str(tmp_path / "nonexistent_env.json"))
    with pytest.raises(FileNotFoundError):
        L.load_lpips(str(tmp_path / "missing.npz"))
