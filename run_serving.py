"""Serving CLI: AOT-compile a checkpoint and serve burst-SR predictions
over HTTP with dynamic micro-batching (see ``dbsr_tpu/serving_daemon.py``
for the API).

    python run_serving.py --checkpoint ws/dbsr/default_synthetic/dbsr_synthetic_ep0100.ckpt \
        [--port 8000] [--batch_size 8] [--burst_size 14] [--linger_ms 5]

Client example::

    import io, numpy as np, urllib.request
    buf = io.BytesIO(); np.save(buf, burst)          # [14, 48, 48, 4]
    req = urllib.request.Request("http://127.0.0.1:8000/predict",
                                 data=buf.getvalue(), method="POST")
    rgb = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--burst_size", type=int, default=14)
    ap.add_argument("--burst_hw", default="48,48")
    ap.add_argument("--linger_ms", type=float, default=5.0)
    ap.add_argument("--f32", action="store_true",
                    help="f32 compute instead of the bf16 serving default")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from dbsr_tpu.serving import load_predictor
    from dbsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from dbsr_tpu.serving_daemon import make_server

    hw = tuple(int(x) for x in args.burst_hw.split(","))
    pred = load_predictor(args.checkpoint, batch_size=args.batch_size,
                          burst_size=args.burst_size, burst_hw=hw,
                          dtype=None if args.f32 else jnp.bfloat16)
    print(f"compiled {pred.in_shape} in {pred.compile_seconds:.1f}s "
          f"({(pred.flops_per_batch or 0) / 1e9:.1f} GFLOP/batch)",
          flush=True)
    server = make_server(pred, host=args.host, port=args.port,
                         linger_ms=args.linger_ms)
    print(f"serving on http://{args.host}:{args.port} "
          f"(POST /predict, GET /healthz, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.close()


if __name__ == "__main__":
    main()
