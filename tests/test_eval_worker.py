"""Unit tests for the persistent eval worker (util_scripts/eval_worker.py)
and its campaign-side client (parity_campaign.EvalWorkerClient): the file
RPC round-trip, error reporting, lifecycle (stop/idle), orphan
retirement, and the fallback signals the campaign relies on. No TPU, no
real scorer, no real worker subprocess."""

import importlib.util
import json
import os
import threading

_here = os.path.dirname(__file__)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_here, os.pardir, "util_scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ew = _load("eval_worker")
pc = _load("parity_campaign")


def _write_req(d, rid, epochs, out_json):
    with open(os.path.join(d, f"req_{rid}.json"), "w") as f:
        json.dump({"epochs": epochs, "out_json": out_json}, f)


def test_serve_scores_requests_in_order(tmp_path):
    d = str(tmp_path / "rpc")
    os.makedirs(d)
    out1, out2 = str(tmp_path / "o1.json"), str(tmp_path / "o2.json")
    _write_req(d, "000001", [5, 10], out1)
    _write_req(d, "000002", [15], out2)

    calls = []

    def score_request(scorer, req):
        calls.append(req["epochs"])
        return {"psnr": {f"ep{e}": float(e) for e in req["epochs"]}}

    # serve() only sleeps once the queue is drained; first sleep => both
    # requests are done, so ask it to exit
    def sleep(s):
        with open(os.path.join(d, "stop"), "w"):
            pass

    served = ew.serve(d, lambda: "scorer", score_request, sleep=sleep)
    assert served == 2
    assert calls == [[5, 10], [15]]
    assert json.load(open(out1)) == {"psnr": {"ep5": 5.0, "ep10": 10.0}}
    assert json.load(open(out2)) == {"psnr": {"ep15": 15.0}}
    for rid in ("000001", "000002"):
        assert json.load(open(
            os.path.join(d, f"done_{rid}.json")))["ok"]
    assert os.path.exists(os.path.join(d, "ready"))
    assert os.path.exists(os.path.join(d, "heartbeat"))


def test_serve_reports_error_and_stays_alive(tmp_path):
    d = str(tmp_path / "rpc")
    os.makedirs(d)
    _write_req(d, "000001", [5], str(tmp_path / "o1.json"))
    _write_req(d, "000002", [10], str(tmp_path / "o2.json"))

    def score_request(scorer, req):
        if req["epochs"] == [5]:
            raise FileNotFoundError("no checkpoints")
        return {"psnr": {}}

    def sleep(s):
        with open(os.path.join(d, "stop"), "w"):
            pass

    served = ew.serve(d, lambda: None, score_request, sleep=sleep)
    assert served == 2
    d1 = json.load(open(os.path.join(d, "done_000001.json")))
    assert not d1["ok"] and "no checkpoints" in d1["error"]
    assert json.load(open(os.path.join(d, "done_000002.json")))["ok"]


def test_serve_idle_timeout(tmp_path):
    d = str(tmp_path / "rpc")
    clock = [0.0]

    def now():
        return clock[0]

    def sleep(s):
        clock[0] += 100.0

    served = ew.serve(d, lambda: None, lambda sc, r: {}, idle_timeout=250.0,
                      now=now, sleep=sleep)
    assert served == 0


class DummyProc:
    def __init__(self):
        self.killed = False
        self.pid = 4242

    def poll(self):
        return 1 if self.killed else None

    def kill(self):
        self.killed = True

    def wait(self, timeout=None):
        return 0


def _client(tmp_path, **kw):
    env = {}
    return pc.EvalWorkerClient(str(tmp_path / "ws"), env,
                               str(tmp_path / "log.txt"), "python", **kw)


def test_client_retires_orphan_incarnations(tmp_path):
    stale = tmp_path / "ws" / "eval_worker" / "w123"
    stale.mkdir(parents=True)
    _client(tmp_path)
    assert (stale / "stop").exists()


def test_client_round_trip_against_served_dir(tmp_path):
    """Client score() against a serve() loop running in a thread — the
    full RPC contract without a subprocess or scorer."""
    client = _client(tmp_path, poll_s=0.01)
    rpc = tmp_path / "ws" / "eval_worker" / "wthread"
    rpc.mkdir(parents=True)
    client.rpc_dir = str(rpc)
    client.proc = DummyProc()  # "alive": _ensure_ready sees the ready file

    t = threading.Thread(
        target=ew.serve,
        args=(str(rpc), lambda: None,
              lambda sc, req: {"psnr": {"ep": 1.0}}),
        kwargs=dict(poll_s=0.01), daemon=True)
    t.start()
    out_json = str(tmp_path / "scores.json")
    assert client.score([5, 10], out_json, timeout=10.0)
    assert json.load(open(out_json)) == {"psnr": {"ep": 1.0}}
    (rpc / "stop").write_text("")
    t.join(timeout=5)
    assert not t.is_alive()


def test_client_request_timeout_kills_worker(tmp_path):
    clock = [0.0]
    client = _client(tmp_path, now=lambda: clock[0],
                     sleep=lambda s: clock.__setitem__(0, clock[0] + 10))
    rpc = tmp_path / "ws" / "eval_worker" / "wdead"
    rpc.mkdir(parents=True)
    (rpc / "ready").write_text("1")
    client.rpc_dir = str(rpc)
    client.proc = DummyProc()
    # nobody answers the request
    assert not client.score([5], str(tmp_path / "o.json"), timeout=30.0)
    assert client.proc is None  # killed so it can't race the fallback


def test_client_worker_death_returns_false(tmp_path):
    proc = DummyProc()
    # the worker "dies" at the first wait inside the request loop
    client = _client(tmp_path,
                     sleep=lambda s: setattr(proc, "killed", True))
    rpc = tmp_path / "ws" / "eval_worker" / "wdies"
    rpc.mkdir(parents=True)
    (rpc / "ready").write_text("1")
    client.rpc_dir = str(rpc)
    client.proc = proc
    assert not client.score([5], str(tmp_path / "o.json"), timeout=60.0)
