"""Unit tests for the reset-proofing snapshot daemon
(util_scripts/snapshot_campaign.py): trajectory change detection,
pathspec-scoped git commits in a throwaway repo, and the
poll-step state machine (trajectory-only until completion, best-params
export exactly once, export failure retried). No daemons, no /tmp."""

import importlib.util
import json
import os
import subprocess

import pytest

_US = os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


sc = _load("snapshot_campaign", os.path.join(_US, "snapshot_campaign.py"))


def _row(epoch, psnr):
    return json.dumps({"epoch": epoch, "psnr": psnr, "ssim": 0.9}) + "\n"


def test_best_row_picks_best_psnr():
    text = _row(5, 30.0) + "garbage\n" + _row(10, 32.5) + _row(15, 31.9)
    assert sc.best_row(text) == (10, 32.5)
    assert sc.best_row("") is None


def test_best_row_last_occurrence_wins_per_epoch():
    # a restarted campaign re-appends epoch 10 with a lower score: the
    # re-scored value must win, matching export_best_dbsr.best_epoch
    text = _row(10, 35.0) + _row(15, 31.9) + _row(10, 30.0)
    assert sc.best_row(text) == (15, 31.9)


def test_snapshot_trajectory_change_detection(tmp_path):
    ws = tmp_path / "ws"
    ws.mkdir()
    dest = str(tmp_path / "art" / "r_trajectory.jsonl")
    # no source trajectory yet
    assert sc.snapshot_trajectory(str(ws), dest) is None
    (ws / "campaign_trajectory.jsonl").write_text(_row(5, 30.0))
    assert sc.snapshot_trajectory(str(ws), dest) == _row(5, 30.0)
    # unchanged => no-op
    assert sc.snapshot_trajectory(str(ws), dest) is None
    (ws / "campaign_trajectory.jsonl").write_text(
        _row(5, 30.0) + _row(10, 31.0))
    assert sc.snapshot_trajectory(str(ws), dest) is not None
    with open(dest) as f:
        assert f.read().count("\n") == 2


@pytest.fixture
def git_repo(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    for args in (["init", "-q"],
                 ["config", "user.email", "t@t"],
                 ["config", "user.name", "t"]):
        subprocess.run(["git", "-C", str(repo)] + args, check=True)
    (repo / "base.txt").write_text("base\n")
    subprocess.run(["git", "-C", str(repo), "add", "base.txt"], check=True)
    subprocess.run(["git", "-C", str(repo), "commit", "-q", "-m", "base"],
                   check=True)
    return repo


def _git_log(repo):
    return subprocess.run(["git", "-C", str(repo), "log", "--oneline"],
                          capture_output=True, text=True).stdout


def test_git_commit_scoped_to_paths(git_repo):
    snap = git_repo / "art" / "traj.jsonl"
    snap.parent.mkdir()
    snap.write_text(_row(5, 30.0))
    # an unrelated dirty+staged file must NOT be swept into the commit
    other = git_repo / "wip.txt"
    other.write_text("uncommitted work\n")
    subprocess.run(["git", "-C", str(git_repo), "add", "wip.txt"],
                   check=True)
    assert sc.git_commit([str(snap)], "Snapshot traj",
                         cwd=str(git_repo)) == "committed"
    show = subprocess.run(
        ["git", "-C", str(git_repo), "show", "--stat", "--name-only",
         "HEAD"], capture_output=True, text=True).stdout
    assert "art/traj.jsonl" in show and "wip.txt" not in show
    status = subprocess.run(["git", "-C", str(git_repo), "status",
                             "--short"], capture_output=True,
                            text=True).stdout
    assert "wip.txt" in status  # still pending, untouched


def test_git_commit_nothing_to_commit(git_repo):
    snap = git_repo / "traj.jsonl"
    snap.write_text("x\n")
    assert sc.git_commit([str(snap)], "first",
                         cwd=str(git_repo)) == "committed"
    assert sc.git_commit([str(snap)], "second",
                         cwd=str(git_repo)) == "clean"
    assert _git_log(git_repo).count("\n") == 2  # base + first only


def test_snapshot_step_state_machine(tmp_path, monkeypatch):
    ws = tmp_path / "ws"
    ws.mkdir()
    label = "rX"
    monkeypatch.setattr(sc, "REPO", str(tmp_path / "repo"))
    ckpt = tmp_path / "repo" / sc.ART_DIR / "rX_best_params.ckpt"
    commits, exports = [], []

    def export():
        exports.append(1)
        ckpt.parent.mkdir(parents=True, exist_ok=True)
        ckpt.write_bytes(b"params")

    def commit(paths, msg):
        commits.append(msg)
        return "committed"

    # 1. first scored rows, incomplete: trajectory commit + MID-FLIGHT
    # bank (nothing banked yet) — but NOT the daemon's exit condition
    (ws / "campaign_trajectory.jsonl").write_text(_row(5, 30.12))
    done = sc.snapshot_step(str(ws), label, False, commit=commit,
                            export=export, complete=lambda w: False)
    assert done is False and exports == [1]
    assert commits == [
        "Snapshot campaign rX trajectory (epoch 5, best 30.12 dB)",
        "Snapshot campaign rX in-flight best checkpoint "
        "(epoch 5, 30.12 dB)"]

    # 2. unchanged + incomplete: nothing happens (spacing gate — the
    # fresh artifact mtime blocks a re-bank)
    done = sc.snapshot_step(str(ws), label, False, commit=commit,
                            export=export, complete=lambda w: False)
    assert done is False and exports == [1] and len(commits) == 2

    # 3. complete: unconditional final export + params commit
    (ws / "campaign_trajectory.jsonl").write_text(
        _row(5, 30.12) + _row(100, 33.4))
    done = sc.snapshot_step(str(ws), label, False, commit=commit,
                            export=export, complete=lambda w: True)
    assert done is True and exports == [1, 1]
    assert commits[-1] == ("Snapshot campaign rX best checkpoint "
                           "(epoch 100, 33.40 dB)")

    # 4. already exported: no second export even though complete
    done = sc.snapshot_step(str(ws), label, True, commit=commit,
                            export=export, complete=lambda w: True)
    assert done is True and exports == [1, 1]


def test_snapshot_step_midflight_margin_and_spacing(tmp_path, monkeypatch):
    """In-flight banking fires only when the best scored epoch beats the
    BANKED one by MIDFLIGHT_MARGIN_DB and the last blob is older than
    MIDFLIGHT_SPACING_S — the bound on repo bloat."""
    ws = tmp_path / "ws"
    ws.mkdir()
    monkeypatch.setattr(sc, "REPO", str(tmp_path / "repo"))
    ckpt = tmp_path / "repo" / sc.ART_DIR / "rX_best_params.ckpt"
    exports, clock = [], [1000.0]
    banked = [None]  # what banked_psnr would report for the artifact

    def export():
        exports.append(1)
        ckpt.parent.mkdir(parents=True, exist_ok=True)
        ckpt.write_bytes(b"params")
        os.utime(ckpt, (clock[0], clock[0]))

    monkeypatch.setattr(sc, "banked_psnr", lambda c, t: banked[0])
    step = lambda: sc.snapshot_step(
        str(ws), "rX", False, commit=lambda p, m: "committed",
        export=export, complete=lambda w: False, now=lambda: clock[0])

    below = 30.0 + 0.5 * sc.MIDFLIGHT_MARGIN_DB
    above = 30.0 + 1.2 * sc.MIDFLIGHT_MARGIN_DB

    (ws / "campaign_trajectory.jsonl").write_text(_row(5, 30.0))
    assert step() is False and exports == [1]  # nothing banked -> bank
    banked[0] = 30.0

    # below margin: gated, even after the spacing window
    clock[0] += sc.MIDFLIGHT_SPACING_S + 1
    (ws / "campaign_trajectory.jsonl").write_text(
        _row(5, 30.0) + _row(10, below))
    assert step() is False and exports == [1]

    # above margin but inside the spacing window: still gated
    (ws / "campaign_trajectory.jsonl").write_text(
        _row(5, 30.0) + _row(10, above))
    clock[0] = 1000.0 + 10
    assert step() is False and exports == [1]

    # above margin and spaced: banks
    clock[0] = 1000.0 + sc.MIDFLIGHT_SPACING_S + 1
    assert step() is False and exports == [1, 1]


def test_snapshot_step_export_failure_retried(tmp_path, monkeypatch):
    ws = tmp_path / "ws"
    ws.mkdir()
    monkeypatch.setattr(sc, "REPO", str(tmp_path / "repo"))
    (ws / "campaign_trajectory.jsonl").write_text(_row(100, 33.0))

    def bad_export():
        raise FileNotFoundError("checkpoint missing")

    done = sc.snapshot_step(str(ws), "rX", False,
                            commit=lambda p, m: "committed",
                            export=bad_export,
                            complete=lambda w: True)
    assert done is False  # stays un-exported => retried next poll


def test_snapshot_step_commit_failure_not_exported(tmp_path, monkeypatch):
    """A failed params commit (e.g. index.lock contention outlasting the
    retry budget) must NOT mark the campaign exported — the ~40 MB blob
    would live only in the working tree, still inside the VM-reset loss
    window (ADVICE r3)."""
    ws = tmp_path / "ws"
    ws.mkdir()
    monkeypatch.setattr(sc, "REPO", str(tmp_path / "repo"))
    (ws / "campaign_trajectory.jsonl").write_text(_row(100, 33.0))

    statuses = iter(["committed", "failed", "committed", "committed"])
    done = sc.snapshot_step(str(ws), "rX", False,
                            commit=lambda p, m: next(statuses),
                            export=lambda: None,
                            complete=lambda w: True)
    assert done is False  # commit failed => retry next poll
    done = sc.snapshot_step(str(ws), "rX", False,
                            commit=lambda p, m: next(statuses),
                            export=lambda: None,
                            complete=lambda w: True)
    assert done is True


def test_session_queue_launch_snapshot_guard(tmp_path):
    sq = _load("session_queue", os.path.join(_US, "session_queue.py"))
    launches = []
    pf = sq.launch_snapshot(str(tmp_path / "wsA"),
                            launch=lambda argv, out, pidfile:
                            launches.append((argv, pidfile)),
                            alive=lambda p: False)
    assert len(launches) == 1
    argv, pidfile = launches[0]
    assert pf == pidfile and "snapshot_wsA_" in pidfile
    assert pidfile.endswith(".pid")
    # same basename, different path => different pidfile (no dedup)
    pf2 = sq.launch_snapshot(str(tmp_path / "other" / "wsA"),
                             launch=lambda argv, out, pidfile:
                             launches.append((argv, pidfile)),
                             alive=lambda p: False)
    assert pf2 != pf and len(launches) == 2
    # the daemon gets the ABSOLUTE workspace path (cwd=REPO child)
    argv2 = launches[1][0]
    assert os.path.isabs(argv2[argv2.index("--workspace") + 1])
    assert "snapshot_campaign.py" in argv[1]
    assert argv[argv.index("--label") + 1] == "wsA"
    # alive pidfile => no duplicate daemon
    sq.launch_snapshot(str(tmp_path / "wsA"),
                       launch=lambda *a: launches.append(a),
                       alive=lambda p: True)
    assert len(launches) == 2
