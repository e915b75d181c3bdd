"""Unit tests for the serial chip-work queue (util_scripts/chip_queue.py).

The queue manages hours of unattended chip time across session/round
boundaries; these tests pin its control flow with stubbed subprocess
launches — no real campaign/watchdog processes or /tmp pidfiles are
touched.
"""

import importlib.util
import os
import types

_spec = importlib.util.spec_from_file_location(
    "chip_queue",
    os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                 "chip_queue.py"))
cq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cq)


def _args(tmp_path, **over):
    d = dict(campaign_ws=str(tmp_path / "camp"),
             ablation_ws=str(tmp_path / "abl"),
             ablation_epochs=20, ablation_arms="e2e,scratch",
             max_relaunches=3, probe_steps=1000)
    d.update(over)
    return types.SimpleNamespace(**d)


def _mark_complete(ws):
    os.makedirs(ws, exist_ok=True)
    with open(os.path.join(ws, "driver.out"), "a") as f:
        f.write("campaign complete\n")


def test_alive_and_campaign_complete(tmp_path):
    pidfile = tmp_path / "x.pid"
    assert not cq.alive(str(pidfile))            # missing file
    pidfile.write_text("not-a-pid")
    assert not cq.alive(str(pidfile))            # unparseable
    pidfile.write_text(str(os.getpid()))
    assert cq.alive(str(pidfile))                # this very process
    pidfile.write_text("999999999")
    assert not cq.alive(str(pidfile))            # ESRCH

    # a ZOMBIE is dead for pidfile purposes: os.kill(pid, 0) succeeds on
    # one, and a babysitter trusting kill-0 waits on the corpse forever
    # (round 5: the killed campaign driver was never relaunched)
    import subprocess
    import time
    z = subprocess.Popen(["true"])
    for _ in range(100):                          # wait for Z state
        with open(f"/proc/{z.pid}/stat") as f:
            if f.read().rsplit(")", 1)[1].split()[0] == "Z":
                break
        time.sleep(0.05)
    pidfile.write_text(str(z.pid))
    assert not cq.alive(str(pidfile))            # zombie
    z.wait()

    ws = str(tmp_path / "camp")
    assert not cq.campaign_complete(ws)          # no driver.out
    os.makedirs(ws)
    open(os.path.join(ws, "driver.out"), "w").write("running...\n")
    assert not cq.campaign_complete(ws)
    _mark_complete(ws)
    assert cq.campaign_complete(ws)


def test_campaign_phase_waits_while_alive(tmp_path, monkeypatch):
    """A live driver is never relaunched; the phase polls until the
    completion marker appears."""
    args = _args(tmp_path)
    pidfile = tmp_path / "campaign.pid"
    pidfile.write_text(str(os.getpid()))
    launches = []
    monkeypatch.setattr(cq, "launch",
                        lambda argv, out, pf: launches.append(argv))
    polls = []

    def sleep(s):
        polls.append(s)
        if len(polls) == 3:                       # campaign finishes
            _mark_complete(args.campaign_ws)

    cq.campaign_phase(args, pidfile=str(pidfile), poll_s=7, sleep=sleep)
    assert launches == []
    assert polls == [7, 7, 7]


def test_campaign_phase_relaunches_dead_driver(tmp_path, monkeypatch):
    args = _args(tmp_path)
    pidfile = tmp_path / "campaign.pid"          # never exists -> dead
    launches = []

    def fake_launch(argv, out_path, pf):
        launches.append(argv)
        if len(launches) == 2:
            _mark_complete(args.campaign_ws)

    monkeypatch.setattr(cq, "launch", fake_launch)
    cq.campaign_phase(args, pidfile=str(pidfile), sleep=lambda s: None)
    assert len(launches) == 2
    assert "util_scripts/parity_campaign.py" in launches[0][1]
    assert ["--workspace", args.campaign_ws] == launches[0][2:4]


def test_campaign_phase_relaunch_budget(tmp_path, monkeypatch):
    """A driver that keeps dying only gets --max_relaunches attempts,
    then the phase falls through so ablation still runs."""
    args = _args(tmp_path, max_relaunches=2)
    launches = []
    monkeypatch.setattr(cq, "launch",
                        lambda argv, out, pf: launches.append(argv))
    cq.campaign_phase(args, pidfile=str(tmp_path / "none.pid"),
                      sleep=lambda s: None)       # returns, no hang
    assert len(launches) == 2


def test_ablation_argv_reuses_campaign_artifacts(tmp_path):
    args = _args(tmp_path)
    argv = cq.ablation_argv(args)
    assert "--pwc_workspace" not in argv and "--val_dir" not in argv
    os.makedirs(os.path.join(args.campaign_ws, "pwcnet",
                             "pretrain_synthetic"))
    os.makedirs(os.path.join(args.campaign_ws, "procedural_val", "gt"))
    argv = cq.ablation_argv(args)
    assert argv[argv.index("--pwc_workspace") + 1] == args.campaign_ws
    assert argv[argv.index("--val_dir") + 1] == os.path.join(
        args.campaign_ws, "procedural_val")
    assert argv[argv.index("--arms") + 1] == "e2e,scratch"
    assert argv[argv.index("--epochs") + 1] == "20"


def test_ablation_phase_retargets_watchdog_then_runs(tmp_path, monkeypatch):
    args = _args(tmp_path)
    order = []
    monkeypatch.setattr(
        cq, "retarget_watchdog",
        lambda log, pidfile=None: order.append(("watchdog", log)))
    rc = cq.ablation_phase(args, run=lambda argv, cwd, env=None: order.append(
        ("run", argv)) or 0, watchdog_pidfile=str(tmp_path / "wd.pid"))
    assert rc == 0
    assert order[0][0] == "watchdog"
    assert order[0][1] == os.path.join(args.ablation_ws, "ablation.log")
    assert order[1][0] == "run"
    assert os.path.isdir(args.ablation_ws)


def test_probe_phase_transfer_gated_on_bigflow_artifact(tmp_path):
    args = _args(tmp_path)
    os.makedirs(args.ablation_ws)
    calls = []

    def run_saves(argv, cwd, env=None):
        calls.append(argv)
        open(argv[argv.index("--save") + 1], "w").write("x")
        return 0

    cq.probe_phase(args, run=run_saves)
    assert len(calls) == 2                        # bigflow then transfer
    assert calls[0][calls[0].index("--regime") + 1] == "bigflow"
    assert calls[1][calls[1].index("--regime") + 1] == "dbsr"
    assert calls[1][calls[1].index("--steps") + 1] == "500"
    assert "--init_from" in calls[1]

    # bigflow fails -> no transfer stage
    calls.clear()
    for f in os.listdir(args.ablation_ws):
        os.remove(os.path.join(args.ablation_ws, f))
    cq.probe_phase(args, run=lambda argv, cwd, env=None: calls.append(argv) or 1)
    assert len(calls) == 1

    # probe_steps=0 disables entirely
    calls.clear()
    cq.probe_phase(_args(tmp_path, probe_steps=0),
                   run=lambda argv, cwd, env=None: calls.append(argv) or 0)
    assert calls == []


def test_retarget_watchdog_kills_by_pidfile_and_relaunches(tmp_path,
                                                           monkeypatch):
    pidfile = tmp_path / "wd.pid"
    pidfile.write_text("999999999")              # dead pid: kill is a no-op
    launches = []
    monkeypatch.setattr(cq, "launch",
                        lambda argv, out, pf: launches.append((argv, pf)))
    log = str(tmp_path / "abl" / "ablation.log")
    os.makedirs(os.path.dirname(log))
    cq.retarget_watchdog(log, pidfile=str(pidfile), sleep=lambda s: None)
    (argv, pf), = launches
    assert "util_scripts/campaign_watchdog.py" in argv[1]
    assert argv[argv.index("--log") + 1] == log
    assert pf == str(pidfile)


def test_parse_args_defaults():
    a = cq.parse_args(["--campaign_ws", "/c", "--ablation_ws", "/a"])
    assert (a.ablation_epochs, a.max_relaunches, a.probe_steps) == \
        (20, 3, 30000)
    assert a.ablation_arms == "e2e,scratch"


def test_child_env_prepends_repo_to_pythonpath(monkeypatch):
    """Children must be able to `import dbsr_tpu` regardless of the
    launcher's env, WITHOUT dropping existing entries (e.g. a backend
    plugin's sitecustomize dir)."""
    monkeypatch.setenv("PYTHONPATH", "/some/site")
    env = cq._child_env()
    parts = env["PYTHONPATH"].split(os.pathsep)
    assert parts[0] == cq.REPO and "/some/site" in parts

    monkeypatch.delenv("PYTHONPATH")
    assert cq._child_env()["PYTHONPATH"] == cq.REPO


def test_find_driver_scans_proc(tmp_path):
    proc = tmp_path / "proc"
    for pid, cmd in ((123, "python parity_campaign.py --workspace /ws/a"),
                     (456, "python parity_campaign.py --workspace /ws/ab"),
                     (789, "python run_training.py dbsr")):
        d = proc / str(pid)
        d.mkdir(parents=True)
        (d / "cmdline").write_bytes(cmd.replace(" ", "\0").encode())
    (proc / "self").mkdir()  # non-numeric entries are skipped
    assert cq.find_driver("/ws/a", proc=str(proc)) == 123
    # /ws/a must NOT match the /ws/ab driver (prefix collision — the
    # live layout has .../campaign_r3 and .../campaign_r3b side by side)
    assert cq.find_driver("/ws/ab", proc=str(proc)) == 456
    assert cq.find_driver("/ws/a/", proc=str(proc)) == 123  # normpath
    assert cq.find_driver("/ws/c", proc=str(proc)) is None


def test_campaign_phase_adopts_stale_pidfile_driver(tmp_path, monkeypatch):
    """A clobbered pidfile with a live driver must NOT trigger a
    duplicate relaunch — the queue adopts the found pid."""
    args = _args(tmp_path)
    pidfile = str(tmp_path / "campaign.pid")
    (tmp_path / "camp").mkdir()
    monkeypatch.setattr(cq, "find_driver",
                        lambda ws: 4242 if ws == args.campaign_ws else None)
    launched = []
    monkeypatch.setattr(cq, "launch",
                        lambda argv, out, pf: launched.append(argv))
    sleeps = [0]

    def fake_sleep(s):
        sleeps[0] += 1
        if sleeps[0] >= 2:
            _mark_complete(args.campaign_ws)

    cq.campaign_phase(args, pidfile=pidfile, sleep=fake_sleep)
    assert launched == []  # adopted, never relaunched
    with open(pidfile) as f:
        assert f.read() == "4242"
