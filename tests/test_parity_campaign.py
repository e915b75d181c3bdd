"""Unit tests for the parity-campaign driver's batched-eval helpers.

The campaign (``util_scripts/parity_campaign.py``) scores checkpoints in
batches through one trajectory-eval process; these pin the pure scheduling
/ result-unpacking logic (which eval points are due, and how a
``compute_score_trajectory`` JSON dict becomes per-epoch trajectory rows).
"""

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "parity_campaign",
    os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                 "parity_campaign.py"))
pc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pc)


def test_pending_eval_epochs_basic():
    # nothing scored: every multiple of eval_every up to now is pending
    assert pc.pending_eval_epochs(5, 20, set()) == [5, 10, 15, 20]
    # partially scored: only unscored points remain, order preserved
    assert pc.pending_eval_epochs(5, 20, {5, 15}) == [10, 20]
    # now not aligned to the cadence: trailing partial chunk is not due
    assert pc.pending_eval_epochs(5, 23, {5, 10, 15, 20}) == []
    assert pc.pending_eval_epochs(5, 4, set()) == []
    # everything scored
    assert pc.pending_eval_epochs(10, 30, {10, 20, 30}) == []


def test_trajectory_rows_unpacks_epochs():
    scores = {
        "psnr": {"dbsr_default_synthetic_ep0005": 30.9,
                 "dbsr_default_synthetic_ep0010": 31.6},
        "ssim": {"dbsr_default_synthetic_ep0005": 0.90,
                 "dbsr_default_synthetic_ep0010": 0.92},
    }
    rows = pc.trajectory_rows(scores, [5, 10])
    assert rows == [{"epoch": 5, "psnr": 30.9, "ssim": 0.90},
                    {"epoch": 10, "psnr": 31.6, "ssim": 0.92}]


def test_trajectory_rows_missing_epoch_raises():
    scores = {"psnr": {"net_ep0005": 30.9}}
    with pytest.raises(RuntimeError, match="epoch 10"):
        pc.trajectory_rows(scores, [5, 10])


def test_seed_pretrained_flow(tmp_path):
    """Reset recovery: a wiped workspace is seeded from the repo-baked
    params-only artifact only when the artifact's epoch meets the
    pretrain target; an existing workspace checkpoint wins."""
    import json
    import struct

    def write_ckpt(path, epoch):
        header = json.dumps({"epoch": epoch, "params_only": True}).encode()
        with open(path, "wb") as f:
            f.write(b"DBSRTPU1")
            f.write(struct.pack("<Q", len(header)))
            f.write(header)
            f.write(b"\x80")  # empty msgpack map

    art = tmp_path / "pwcnet_synth_params.ckpt"
    ws = tmp_path / "ws"
    pwc_dir = ws / "pwcnet" / "pretrain_synthetic"

    # artifact below the target epoch: not seeded (would trip the
    # params-only resume guard downstream)
    write_ckpt(art, 10)
    assert pc.seed_pretrained_flow(str(ws), str(art), 15) == ""
    assert not pwc_dir.exists()

    # artifact at target: seeded, and the driver's pretrain gate sees it
    write_ckpt(art, 15)
    dst = pc.seed_pretrained_flow(str(ws), str(art), 15)
    assert dst.endswith("pwcnet_synth_ep0015.ckpt") and os.path.exists(dst)
    assert pc.latest_epoch(str(ws), "pwcnet/pretrain_synthetic",
                           "pwcnet_synth") == 15

    # idempotent: an existing workspace checkpoint suppresses reseeding
    assert pc.seed_pretrained_flow(str(ws), str(art), 15) == ""

    # missing artifact: no-op
    assert pc.seed_pretrained_flow(str(tmp_path / "ws2"),
                                   str(tmp_path / "nope.ckpt"), 15) == ""


def test_seed_dbsr_from_bank_restores_markers_up_to_bank(tmp_path,
                                                        monkeypatch):
    """Reset recovery for the FLAGSHIP: the wiped workspace is reseeded
    from the git-banked best params, the banked trajectory is restored
    whole (history), but eval markers only up to the banked epoch — the
    replayed epochs must be re-scored so banking points exist during
    the replay window (round 5 resumed at 45 with the lost lineage
    scored through 70)."""
    import json
    import struct

    def write_ckpt(path, epoch):
        header = json.dumps({"epoch": epoch, "params_only": True}).encode()
        with open(path, "wb") as f:
            f.write(b"DBSRTPU1")
            f.write(struct.pack("<Q", len(header)))
            f.write(header)
            f.write(b"\x80")

    repo = tmp_path / "repo"
    art = repo / "dbsr_tpu" / "artifacts" / "campaigns"
    art.mkdir(parents=True)
    ws = tmp_path / "dbsr_campaign_x"
    ws.mkdir()
    write_ckpt(art / "dbsr_campaign_x_best_params.ckpt", 45)
    with open(art / "dbsr_campaign_x_trajectory.jsonl", "w") as f:
        for e, p in [(40, 36.8), (45, 37.15), (50, 37.0), (70, 37.39)]:
            f.write(json.dumps({"epoch": e, "psnr": p}) + "\n")
    monkeypatch.setattr(pc, "REPO", str(repo))

    dst = pc.seed_dbsr_from_bank(str(ws))
    assert dst.endswith("dbsr_synthetic_ep0045.ckpt")
    assert os.path.exists(dst)
    assert (ws / "campaign_trajectory.jsonl").read_text().count("\n") == 4
    assert (ws / "eval_ep0040.json").exists()
    assert (ws / "eval_ep0045.json").exists()
    assert not (ws / "eval_ep0050.json").exists()
    assert not (ws / "eval_ep0070.json").exists()
    # idempotent: an existing workspace checkpoint suppresses reseeding
    assert pc.seed_dbsr_from_bank(str(ws)) == ""


def test_watchdog_should_kill_logic():
    """Watchdog kills only when the log is stale AND the stage process
    is old enough to be past first compile (fresh subprocesses print
    nothing while compiling; resumes compile for up to ~8 min)."""
    _spec2 = importlib.util.spec_from_file_location(
        "campaign_watchdog",
        os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                     "campaign_watchdog.py"))
    wd = importlib.util.module_from_spec(_spec2)
    _spec2.loader.exec_module(wd)

    now = 10_000.0
    # silent log + old process: kill
    assert wd.should_kill(now - 1000, 1000, now, stale=900)
    # silent log but YOUNG process (still compiling): spare
    assert not wd.should_kill(now - 1000, 300, now, stale=900)
    # active log: spare regardless of age
    assert not wd.should_kill(now - 30, 5000, now, stale=900)
    # post-suspension grace: a log whose silence predates grace_start
    # (the watchdog itself was SIGSTOPped by chip_guard during a bench)
    # must NOT trigger a kill until `stale` seconds pass AFTER resume
    assert not wd.should_kill(now - 2000, 5000, now, stale=900,
                              grace_start=now - 60)
    # ... but a stage still silent `stale` seconds after the grace point
    # is genuinely wedged
    assert wd.should_kill(now - 3000, 5000, now, stale=900,
                          grace_start=now - 1000)
    # own-process finder never lists the caller
    pids = [p for p, _ in wd.find_stage_pids("campaign_watchdog")]
    assert os.getpid() not in pids


def test_chip_queue_helpers(tmp_path):
    """chip_queue's campaign-completion and pidfile-liveness probes."""
    _spec3 = importlib.util.spec_from_file_location(
        "chip_queue",
        os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                     "chip_queue.py"))
    cq = importlib.util.module_from_spec(_spec3)
    _spec3.loader.exec_module(cq)

    ws = str(tmp_path)
    assert not cq.campaign_complete(ws)  # no driver.out
    (tmp_path / "driver.out").write_text("train to 10\n")
    assert not cq.campaign_complete(ws)  # incomplete
    (tmp_path / "driver.out").write_text("...\ncampaign complete\n")
    assert cq.campaign_complete(ws)

    live = tmp_path / "live.pid"
    live.write_text(str(os.getpid()))
    assert cq.alive(str(live))
    dead = tmp_path / "dead.pid"
    dead.write_text("999999999")
    assert not cq.alive(str(dead))
    assert not cq.alive(str(tmp_path / "missing.pid"))


def test_train_argv_with_overrides():
    argv = pc.train_argv("py", 25, train_set=["seed=2", "pool_size=512"])
    assert argv == ["py", "run_training.py", "dbsr", "default_synthetic",
                    "--set", "epochs=25", "--set", "seed=2",
                    "--set", "pool_size=512"]
    assert pc.train_argv("py", 5)[-2:] == ["--set", "epochs=5"]


def test_export_best_dbsr_picks_max_psnr(tmp_path):
    import importlib.util
    import json as _json
    spec = importlib.util.spec_from_file_location(
        "export_best_dbsr",
        os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                     "export_best_dbsr.py"))
    eb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eb)

    traj = tmp_path / "campaign_trajectory.jsonl"
    with open(traj, "w") as f:
        f.write(_json.dumps({"epoch": 5, "psnr": 30.0}) + "\n")
        f.write(_json.dumps({"epoch": 10, "psnr": 34.2}) + "\n")
        # re-scored epoch: the later line must win
        f.write(_json.dumps({"epoch": 5, "psnr": 35.0}) + "\n")
        f.write(_json.dumps({"epoch": 5, "psnr": 29.0}) + "\n")
    assert eb.best_epoch(str(traj)) == (10, 34.2)

    with pytest.raises(ValueError, match="no scored epochs"):
        empty = tmp_path / "empty.jsonl"
        empty.write_text("")
        eb.best_epoch(str(empty))

    # post-reset fallback: rows from the lost lineage (no checkpoint on
    # disk) must be skipped, not wedge the exporter
    assert eb.best_epoch(str(traj), have={5}) == (5, 29.0)
    with pytest.raises(ValueError, match="checkpoint on disk"):
        eb.best_epoch(str(traj), have=set())


def test_resident_training_monitors_and_retries(tmp_path, capsys):
    """resident_training: completes when the trainer reaches the target,
    fires eval batches on checkpoint progress, relaunches a stalled or
    crashed trainer, and only burns retry budget on zero-progress
    exits."""
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "dbsr", "default_synthetic")
    os.makedirs(ckpt_dir)
    log_path = os.path.join(ws, "log.txt")

    def write_ckpt(epoch):
        open(os.path.join(ckpt_dir,
                          f"dbsr_synthetic_ep{epoch:04d}.ckpt"), "w").close()

    class FakeProc:
        """Writes one checkpoint per poll tick up to `until`, then
        exits with `rc` (None while alive)."""

        def __init__(self, schedule, rc=0):
            self.schedule = list(schedule)
            self.rc = rc
            self.returncode = None
            self.killed = False

        def poll(self):
            if self.killed:
                self.returncode = -9
                return -9
            if self.schedule:
                e = self.schedule.pop(0)
                if e is not None:
                    write_ckpt(e)
                return None
            self.returncode = self.rc
            return self.rc

        def kill(self):
            self.killed = True

        def wait(self):
            return self.rc

    evals = []
    launches = []

    # launch 1: epochs 1,2 then crash (rc=1, HAS progress -> no budget
    # burn); launch 2: stalls after epoch 3 (None = no new ckpt) ->
    # killed; launch 3: runs to the target epoch 5.
    procs = [FakeProc([1, 2], rc=1),
             FakeProc([3, None, None, None], rc=0),
             FakeProc([4, 5], rc=0)]

    def popen(argv, **kw):
        launches.append(argv)
        return procs[len(launches) - 1]

    clock = {"t": 0.0}

    pc.resident_training(
        ws, 5, ["fake_trainer"], env={}, log_path=log_path,
        stall_timeout=2.5, max_retries=2, eval_batch=2,
        pending_evals=lambda now: list(range(1, now + 1)),
        eval_epochs=lambda pend: evals.append(list(pend)),
        poll_s=1.0, popen=popen,
        sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
        now=lambda: clock["t"],
        wait_backend=lambda log: None)

    assert len(launches) == 3
    assert evals and all(len(e) >= 2 for e in evals)
    out = capsys.readouterr().out
    assert "stalled" in out
    # the crash WITH progress must not consume the retry budget
    assert "attempts left" not in out


def test_resident_training_kills_cpu_frozen_trainer(tmp_path, capsys):
    """A trainer whose host CPU time is frozen (relay-wedge signature:
    ~0.3%/s background noise, no real work) is killed after
    freeze_timeout and relaunched WITHOUT burning the retry budget; a
    healthy trainer accruing CPU is left alone until it progresses."""
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "dbsr", "default_synthetic")
    os.makedirs(ckpt_dir)

    class FakeProc:
        pid = 12345
        returncode = None

        def __init__(self):
            self.killed_at = None

        def poll(self):
            return -9 if self.killed_at is not None else None

        def kill(self):
            self.killed_at = clock["t"]
            self.returncode = -9

        def wait(self):
            return -9

    clock = {"t": 0.0}
    procs = []
    # cpu schedules: proc 1 wedged (0.005 cpu-s/s of noise); proc 2
    # healthy (20% duty) and writes the target checkpoint when polled
    # enough
    rates = [0.005, 0.2]

    def cpu_probe(pid):
        return rates[len(procs) - 1] * clock["t"]

    def popen(argv, **kw):
        procs.append(FakeProc())
        if len(procs) == 2:
            # healthy successor reaches the target after ~8 polls
            orig_poll = procs[-1].poll

            def poll():
                if clock["t"] > procs[0].killed_at + 160:
                    open(os.path.join(
                        ckpt_dir, "dbsr_synthetic_ep0005.ckpt"),
                        "w").close()
                return orig_poll()
            procs[-1].poll = poll
        return procs[-1]

    pc.resident_training(
        ws, 5, ["fake_trainer"], env={}, log_path=os.path.join(ws, "l"),
        stall_timeout=10_000.0, max_retries=2, eval_batch=99,
        pending_evals=lambda now: [],
        eval_epochs=lambda pend: None,
        poll_s=20.0, popen=popen,
        sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
        now=lambda: clock["t"],
        wait_backend=lambda log: None,
        cpu_probe=cpu_probe, freeze_timeout=600.0)

    out = capsys.readouterr().out
    assert "cpu-frozen" in out
    # wedge-kill happened around freeze_timeout, far before the
    # checkpoint stall window
    assert 600.0 <= procs[0].killed_at <= 700.0
    # and the wedge kill did not burn the retry budget
    assert "attempts left" not in out


def test_kill_stray_trainers_matches_by_workspace_env(tmp_path):
    """Only run_training processes bound to THIS workspace (by their
    DBSR_TPU_WORKSPACE_DIR env) are killed — never other commands, other
    workspaces, or the caller itself."""
    proc = tmp_path / "proc"
    ws = "/root/dbsr_campaign_x"

    def fake(pid, cmd, env_pairs):
        d = proc / str(pid)
        d.mkdir(parents=True)
        (d / "cmdline").write_bytes(cmd.replace(" ", "\0").encode())
        (d / "environ").write_bytes(
            b"\0".join(f"{k}={v}".encode() for k, v in env_pairs) + b"\0")

    fake(101, "python run_training.py dbsr default_synthetic",
         [("DBSR_TPU_WORKSPACE_DIR", ws)])                 # stray: kill
    fake(102, "python run_training.py dbsr default_synthetic",
         [("DBSR_TPU_WORKSPACE_DIR", "/root/other_ws")])   # other ws
    fake(103, "python run_evaluation.py synburst",
         [("DBSR_TPU_WORKSPACE_DIR", ws)])                 # not a trainer
    fake(104, "python run_training.py dbsr default_synthetic",
         [("HOME", "/root")])                              # no ws binding
    (proc / "abc").mkdir()                                 # non-pid entry

    killed_sig = []
    out = pc.kill_stray_trainers(
        ws, log=lambda m: None, proc=str(proc),
        kill=lambda pid, sig: killed_sig.append((pid, sig)))
    assert out == [101]
    assert killed_sig == [(101, 9)]


def test_resident_training_first_checkpoint_gets_doubled_window(tmp_path):
    """A fresh trainer's FIRST checkpoint rides a cold-cache remote
    compile (measured 14 min post-reset); the stall window before any
    progress must be 2x stall_timeout, and drop back to 1x after."""
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "dbsr", "default_synthetic")
    os.makedirs(ckpt_dir)

    class FakeProc:
        returncode = None

        def __init__(self):
            self.kill_time = None

        def poll(self):
            return -9 if self.kill_time is not None else None

        def kill(self):
            self.kill_time = clock["t"]
            self.returncode = -9

        def wait(self):
            return -9

    clock = {"t": 0.0}
    procs = []

    def popen(argv, **kw):
        procs.append(FakeProc())
        if len(procs) > 2:  # stop the test after two stall-kills
            write = os.path.join(ckpt_dir, "dbsr_synthetic_ep0005.ckpt")
            open(write, "w").close()
        return procs[-1]

    pc.resident_training(
        ws, 5, ["fake_trainer"], env={}, log_path=os.path.join(ws, "l"),
        stall_timeout=10.0, max_retries=3, eval_batch=99,
        pending_evals=lambda now: [],
        eval_epochs=lambda pend: None,
        poll_s=1.0, popen=popen,
        sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
        now=lambda: clock["t"],
        wait_backend=lambda log: None)

    # both stall-kills happened with ZERO progress -> doubled window:
    # killed after >20 virtual seconds, not at the 10 s steady window
    assert procs[0].kill_time > 20.0
    assert procs[1].kill_time - procs[0].kill_time > 20.0


def test_resident_training_fires_backlog_on_relaunch(tmp_path):
    """A driver relaunched over a workspace with checkpoints but unscored
    eval points (the round-4 r4mix failure: 19 checkpoints, zero rows)
    must fire the eval backlog IMMEDIATELY at launch — not wait for the
    next new-checkpoint tick to accumulate >= eval_batch points."""
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "dbsr", "default_synthetic")
    os.makedirs(ckpt_dir)
    # workspace already at epoch 19 from a previous incarnation
    open(os.path.join(ckpt_dir, "dbsr_synthetic_ep0019.ckpt"), "w").close()
    log_path = os.path.join(ws, "log.txt")

    class FakeProc:
        returncode = None

        def __init__(self):
            self.ticks = 0

        def poll(self):
            self.ticks += 1
            if self.ticks >= 2:  # one new ckpt then finish
                open(os.path.join(
                    ckpt_dir, "dbsr_synthetic_ep0020.ckpt"), "w").close()
                self.returncode = 0
                return 0
            return None

        def kill(self):
            pass

        def wait(self):
            return 0

    evals = []
    scored = set()

    def pending(now):
        return [e for e in range(5, now + 1, 5) if e not in scored]

    def eval_epochs(pend):
        evals.append(list(pend))
        scored.update(pend)

    clock = {"t": 0.0}
    pc.resident_training(
        ws, 20, ["fake_trainer"], env={}, log_path=log_path,
        stall_timeout=100, max_retries=2, eval_batch=4,
        pending_evals=pending, eval_epochs=eval_epochs,
        poll_s=1.0, popen=lambda argv, **kw: FakeProc(),
        sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
        now=lambda: clock["t"],
        wait_backend=lambda log: None)

    # the backlog [5, 10, 15] fired at launch, before any new checkpoint
    assert evals and evals[0] == [5, 10, 15]


def test_resident_training_budget_exhaustion(tmp_path):
    ws = str(tmp_path)
    os.makedirs(os.path.join(ws, "dbsr", "default_synthetic"))
    log_path = os.path.join(ws, "log.txt")

    class DeadProc:
        returncode = 1

        def poll(self):
            return 1

        def kill(self):
            pass

        def wait(self):
            return 1

    with pytest.raises(RuntimeError, match="failed repeatedly"):
        pc.resident_training(
            ws, 5, ["fake"], env={}, log_path=log_path,
            stall_timeout=10, max_retries=2, eval_batch=2,
            pending_evals=lambda now: [], eval_epochs=lambda p: None,
            poll_s=0.0, popen=lambda argv, **kw: DeadProc(),
            sleep=lambda s: None, now=lambda: 0.0,
            wait_backend=lambda log: None)


def test_kernel_mismatch_table():
    """util_scripts/kernel_mismatch.py builds the strict-vs-fused table
    from two compute_score dicts, tolerating a net missing from the
    fused run."""
    spec = importlib.util.spec_from_file_location(
        "kernel_mismatch",
        os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                     "kernel_mismatch.py"))
    km = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(km)
    strict = {"psnr": {"a": 33.0, "b": 36.0}, "ssim": {"a": 0.9, "b": 0.95}}
    fused = {"psnr": {"a": 33.5}, "ssim": {"a": 0.91}}
    t = km.mismatch_table(strict, fused)
    assert t["a"]["psnr_gap_fused_minus_strict"] == pytest.approx(0.5)
    assert t["b"]["psnr_fused"] is None
    assert "psnr_gap_fused_minus_strict" not in t["b"]
