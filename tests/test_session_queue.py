"""Unit tests for the post-reset session queue
(util_scripts/session_queue.py): babysit loop control flow (complete /
adopt / relaunch-with-extra-args / budget exhaustion) and the seed-2
seeding fallback. No real processes or /tmp pidfiles are touched."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "session_queue",
    os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                 "session_queue.py"))
sq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sq)


def _complete_ws(tmp_path):
    ws = tmp_path / "ws"
    ws.mkdir()
    (ws / "driver.out").write_text("campaign complete\n")
    return str(ws)


def test_babysit_returns_when_complete(tmp_path, monkeypatch):
    ws = _complete_ws(tmp_path)
    monkeypatch.setattr(sq.cq, "launch",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("must not launch")))
    sq.babysit_campaign(ws, [], str(tmp_path / "pidfile"),
                        sleep=lambda s: (_ for _ in ()).throw(
                            AssertionError("must not sleep")))


def test_babysit_relaunches_with_extra_args(tmp_path, monkeypatch):
    ws = tmp_path / "ws"
    ws.mkdir()
    (ws / "driver.out").write_text("chunk 1 died\n")
    pidfile = str(tmp_path / "pidfile")  # absent => driver not alive
    launches = []

    def fake_launch(argv, out, pf):
        launches.append(argv)
        # the "relaunched driver" completes the campaign immediately
        (ws / "driver.out").write_text("campaign complete\n")

    monkeypatch.setattr(sq.cq, "launch", fake_launch)
    monkeypatch.setattr(sq.cq, "find_driver", lambda w: None)
    sq.babysit_campaign(str(ws), ["--chunk", "25", "--train_set",
                                  "seed=2"], pidfile, sleep=lambda s: None)
    assert len(launches) == 1
    argv = launches[0]
    # seed-variance override survives the relaunch (chip_queue's own
    # campaign_phase would drop it — the reason babysit_campaign exists)
    assert argv[-4:] == ["--chunk", "25", "--train_set", "seed=2"]
    assert "parity_campaign.py" in argv[1]


def test_babysit_adopts_stale_pidfile(tmp_path, monkeypatch):
    ws = tmp_path / "ws"
    ws.mkdir()
    (ws / "driver.out").write_text("running\n")
    pidfile = tmp_path / "pidfile"
    states = iter([4242, None])  # found once, then gone

    monkeypatch.setattr(sq.cq, "find_driver", lambda w: next(states))
    monkeypatch.setattr(sq.cq, "alive", lambda pf: False)
    launches = []

    def fake_launch(argv, out, pf):
        launches.append(argv)
        (ws / "driver.out").write_text("campaign complete\n")

    monkeypatch.setattr(sq.cq, "launch", fake_launch)
    sq.babysit_campaign(str(ws), [], str(pidfile), sleep=lambda s: None)
    assert pidfile.read_text() == "4242"  # adopted, not duplicated
    assert len(launches) == 1  # relaunched only after the driver vanished


def test_babysit_budget_exhaustion_falls_through(tmp_path, monkeypatch):
    ws = tmp_path / "ws"
    ws.mkdir()
    (ws / "driver.out").write_text("never completes\n")
    launches = []
    monkeypatch.setattr(sq.cq, "find_driver", lambda w: None)
    monkeypatch.setattr(sq.cq, "launch",
                        lambda argv, out, pf: launches.append(argv))
    sq.babysit_campaign(str(ws), [], str(tmp_path / "pidfile"),
                        max_relaunches=2, sleep=lambda s: None)
    assert len(launches) == 2  # budget respected; returns instead of spinning


def test_round4_queue_arms(tmp_path, monkeypatch):
    """round4_queue: babysits the flagship, then each arm with the
    flagship's copied val set and its --train_set overrides."""
    spec = importlib.util.spec_from_file_location(
        "round4_queue",
        os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                     "round4_queue.py"))
    r4q = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(r4q)

    ws = tmp_path / "camp"
    (ws / "procedural_val").mkdir(parents=True)
    (ws / "procedural_val" / "format.json").write_text("{}")

    sits, snaps = [], []
    monkeypatch.setattr(r4q.sq, "launch_snapshot",
                        lambda w, **k: snaps.append(w))
    monkeypatch.setattr(r4q.sq, "babysit_campaign",
                        lambda w, extra, pidfile, retries:
                        sits.append((w, list(extra))))

    r4q.main(["--campaign_ws", str(ws), "--arm_epochs", "20"])

    assert sits[0] == (str(ws), [])
    assert sits[1] == (str(ws) + "_mix",
                       ["--epochs", "20", "--train_set", "mix=mixed"])
    assert sits[2] == (str(ws) + "_s2",
                       ["--epochs", "20", "--train_set", "seed=2"])
    # arms got the flagship's frozen val set
    for suffix in ("_mix", "_s2"):
        assert os.path.exists(os.path.join(
            str(ws) + suffix, "procedural_val", "format.json"))
    assert len(snaps) == 3
