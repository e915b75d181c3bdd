"""Serving daemon tests: micro-batching semantics (grouping, linger,
error propagation) with a fake predictor, plus one HTTP round-trip
against the real AOT predictor on a tiny net."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from dbsr_tpu.serving_daemon import MicroBatcher, make_server


class FakePredictor:
    """Records call occupancies; output row = burst mean (identifies
    which input produced which output)."""

    def __init__(self, batch_size=4, frame_shape=(3, 8, 8, 4)):
        self.batch_size = batch_size
        self.in_shape = (batch_size,) + frame_shape
        self.compile_seconds = 0.01
        self.flops_per_batch = 123.0
        self.calls = []

    fail_next = False

    def __call__(self, burst):
        assert burst.shape[0] <= self.batch_size
        self.calls.append(burst.shape[0])
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("device lost")
        return np.array([[b.mean()] for b in burst], np.float32)


def _burst(seed, shape=(3, 8, 8, 4)):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_microbatcher_groups_concurrent_requests():
    pred = FakePredictor(batch_size=4)
    mb = MicroBatcher(pred, linger_ms=200.0)
    bursts = [_burst(i) for i in range(4)]
    results = [None] * 4

    def call(i):
        results[i] = mb.submit(bursts[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # one full-occupancy device call, not four singles
    assert pred.calls == [4]
    for i in range(4):
        np.testing.assert_allclose(results[i], [bursts[i].mean()],
                                   rtol=1e-6)
    mb.close()


def test_microbatcher_linger_dispatches_partial_batch():
    pred = FakePredictor(batch_size=8)
    mb = MicroBatcher(pred, linger_ms=10.0)
    out = mb.submit(_burst(0))  # alone; must not wait for 7 more
    assert out.shape == (1,)
    assert pred.calls == [1]
    mb.close()


def test_microbatcher_rejects_wrong_shape_and_propagates_errors():
    pred = FakePredictor(batch_size=2)
    mb = MicroBatcher(pred, linger_ms=1.0)
    with pytest.raises(ValueError, match="expected one burst"):
        mb.submit(np.zeros((2, 3, 8, 8, 4), np.float32))  # batched input

    pred.fail_next = True
    with pytest.raises(RuntimeError, match="device lost"):
        mb.submit(_burst(1))
    # batcher survives a failed batch
    np.testing.assert_allclose(mb.submit(_burst(2)), [_burst(2).mean()],
                               rtol=1e-6)
    mb.close()


def test_http_round_trip_with_fake_predictor():
    pred = FakePredictor(batch_size=2)
    server = make_server(pred, port=0, linger_ms=1.0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        b = _burst(3)
        buf = io.BytesIO()
        np.save(buf, b)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        np.testing.assert_allclose(out, [b.mean()], rtol=1e-6)

        health = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"))
        assert health["status"] == "ok"
        assert health["input_shape"] == [2, 3, 8, 8, 4]

        # uint16 bodies are accepted at the 2^14 protocol scale
        buf = io.BytesIO()
        np.save(buf, np.rint(b * 2 ** 14).astype(np.uint16))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        out16 = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        np.testing.assert_allclose(out16, out, atol=1e-4)

        # malformed body -> 400 with an error message, server stays up
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not an npy",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400

        # server-side prediction failure -> 503 (retryable), NOT 400:
        # the input was well-formed
        pred.fail_next = True
        buf = io.BytesIO()
        np.save(buf, b)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 503

        stats = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats"))
        assert stats["requests"] == 2 and stats["errors"] == 2
        assert "latency_p95_ms" in stats
    finally:
        server.shutdown()
        server.batcher.close()


def test_http_serving_real_predictor(tmp_path):
    """End-to-end: checkpoint -> AOT predictor -> HTTP prediction equals
    a direct predictor call."""
    import jax
    import jax.numpy as jnp
    import optax

    from dbsr_tpu.data.synthetic import BurstConfig
    from dbsr_tpu.models.dbsr import dbsrnet_tiny
    from dbsr_tpu.serving import load_predictor
    from dbsr_tpu.training.checkpoint import save_checkpoint
    from dbsr_tpu.training.state import TrainState

    cfg = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                      border_crop=4)
    net = dbsrnet_tiny(upsample_factor=4, flow_net="conv")
    burst0 = jnp.zeros((1, 3) + cfg.burst_hw + (4,))
    params = net.init(jax.random.key(0), burst0)
    path = save_checkpoint(str(tmp_path), "tiny", 1,
                           TrainState.create(params, optax.adam(1e-4)),
                           net=net)

    pred = load_predictor(path, batch_size=2, burst_size=3,
                          burst_hw=cfg.burst_hw, dtype=None)
    server = make_server(pred, port=0, linger_ms=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        b = _burst(7, shape=(3,) + cfg.burst_hw + (4,))
        buf = io.BytesIO()
        np.save(buf, b)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        np.testing.assert_allclose(out, pred(b)[0], atol=1e-6)
    finally:
        server.shutdown()
        server.batcher.close()
