"""Persistent eval worker: stage the val set once, score checkpoints on
request for the lifetime of a training campaign.

Every one-shot ``run_evaluation.py`` process pays ~3 min of fixed cost
over a relayed runtime (process init, val-set host->device transfer,
jit compile/retrieval) for ~10 s of device-time scoring. A campaign
evaluates its trajectory ~20 times, so the fixed costs dominate total
eval wall-clock. This worker holds a
:class:`dbsr_tpu.evaluation.synburst.TrajectoryScorer` (staged val
batches in HBM + the fused scored-forward executable) across requests,
reducing each subsequent eval to checkpoint-load + device time.

File-based RPC in ``--dir`` (simple, crash-legible, and inspectable
after the fact — the campaign driver and worker are long-lived
unattended processes):

  - worker writes ``ready`` once staged, touches ``heartbeat`` each poll;
  - client writes ``req_<id>.json``: ``{"epochs": [...],
    "out_json": path}``;
  - worker scores, writes the scores dict to ``out_json``, then
    ``done_<id>.json``: ``{"ok": bool, "error": str}``;
  - a ``stop`` file (or ``--idle_timeout`` with no requests) exits the
    worker so its HBM residency is bounded.

The worker only RECEIVES requests between training chunks (the campaign
driver serializes), so it never computes concurrently with training —
it just stays resident (~400 MB HBM: uint16 val batches + params).

Usage (normally launched by ``parity_campaign.py``):
    python util_scripts/eval_worker.py --dir <ws>/eval_worker \
        --experiment dbsr_default [--dataset_root D] [--max_bursts N]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _req_id(fname: str) -> str:
    return fname[len("req_"):-len(".json")]


def serve(rpc_dir: str, scorer_factory, score_request, poll_s: float = 2.0,
          idle_timeout: float = 3600.0, now=time.time,
          sleep=time.sleep) -> int:
    """RPC loop; returns the number of requests served. ``scorer_factory``
    builds the (expensive) scorer lazily on first need so a worker that
    is started and immediately stopped costs nothing;
    ``score_request(scorer, req) -> dict`` produces the scores for one
    request. Split out for tests (no TPU, fake scorers/clocks)."""
    os.makedirs(rpc_dir, exist_ok=True)
    scorer = scorer_factory()
    with open(os.path.join(rpc_dir, "ready"), "w") as f:
        f.write(str(os.getpid()))
    print(f"eval worker ready in {rpc_dir}", flush=True)

    served = 0
    last_work = now()
    while True:
        if os.path.exists(os.path.join(rpc_dir, "stop")):
            print("eval worker: stop requested", flush=True)
            return served
        if now() - last_work > idle_timeout:
            print(f"eval worker: idle {idle_timeout}s, exiting", flush=True)
            return served
        with open(os.path.join(rpc_dir, "heartbeat"), "w") as f:
            f.write(str(now()))
        reqs = sorted(f for f in os.listdir(rpc_dir)
                      if f.startswith("req_") and f.endswith(".json"))
        pending = [f for f in reqs if not os.path.exists(
            os.path.join(rpc_dir, f"done_{_req_id(f)}.json"))]
        if not pending:
            sleep(poll_s)
            continue
        fname = pending[0]
        rid = _req_id(fname)
        with open(os.path.join(rpc_dir, fname)) as f:
            req = json.load(f)
        print(f"eval worker: request {rid}: {req}", flush=True)
        result = {"ok": True, "error": ""}
        try:
            scores = score_request(scorer, req)
            with open(req["out_json"], "w") as f:
                json.dump(scores, f, indent=2)
        except Exception as e:  # report to client; stay alive
            import traceback
            traceback.print_exc()
            result = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        # write done marker ATOMICALLY after out_json is complete
        tmp = os.path.join(rpc_dir, f".done_{rid}.tmp")
        with open(tmp, "w") as f:
            json.dump(result, f)
        os.rename(tmp, os.path.join(rpc_dir, f"done_{rid}.json"))
        served += 1
        last_work = now()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="RPC directory")
    ap.add_argument("--experiment", default="dbsr_default")
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--max_bursts", type=int, default=None)
    ap.add_argument("--poll_s", type=float, default=2.0)
    ap.add_argument("--idle_timeout", type=float, default=3600.0)
    args = ap.parse_args(argv)

    import importlib

    from dbsr_tpu.environment import env_settings
    from dbsr_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    env = env_settings()
    n0 = importlib.import_module(
        f"dbsr_tpu.evaluation.experiments.{args.experiment}").main()[0]
    root = args.dataset_root or env.synburstval_dir
    workspace = env.workspace_dir

    def factory():
        from dbsr_tpu.evaluation.synburst import TrajectoryScorer
        t0 = time.perf_counter()
        scorer = TrajectoryScorer(root, burst_sz=n0.burst_sz,
                                  max_bursts=args.max_bursts)
        print(f"eval worker: val set staged in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        return scorer

    def score_request(scorer, req):
        return scorer.score(n0.module, n0.parameter,
                            workspace_dir=workspace, net_name=n0.net_name,
                            epochs=req.get("epochs"))

    serve(args.dir, factory, score_request, poll_s=args.poll_s,
          idle_timeout=args.idle_timeout)


if __name__ == "__main__":
    main()
