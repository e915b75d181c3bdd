"""Unit tests for the guarded-rerun queue (util_scripts/queue_rerun.py):
workspace seeding from a damaged campaign, idempotence, and the
wait-for-chip gate. No real processes or /tmp pidfiles are touched."""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "queue_rerun",
    os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                 "queue_rerun.py"))
qr = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(qr)


def _make_src(tmp_path, epochs=(1, 2, 3, 4, 5, 6, 7, 8)):
    src = tmp_path / "src"
    net = src / "dbsr" / "default_synthetic"
    net.mkdir(parents=True)
    for e in epochs:
        (net / f"dbsr_synthetic_ep{e:04d}.ckpt").write_bytes(b"ck%d" % e)
    (src / "pwcnet" / "pretrain_synthetic").mkdir(parents=True)
    (src / "pwcnet" / "pretrain_synthetic" /
     "pwcnet_synth_ep0015.ckpt").write_bytes(b"pwc")
    (src / "procedural_val" / "gt").mkdir(parents=True)
    (src / "eval_ep0005.json").write_text("{}")
    with open(src / "campaign_trajectory.jsonl", "w") as f:
        # a restarted campaign re-appends early epochs; last wins
        f.write(json.dumps({"epoch": 5, "psnr": 11.0}) + "\n")
        f.write(json.dumps({"epoch": 10, "psnr": 12.0}) + "\n")
        f.write(json.dumps({"epoch": 5, "psnr": 30.9}) + "\n")
    return src


def test_prepare_seeds_pre_damage_state(tmp_path):
    src = _make_src(tmp_path)
    dst = tmp_path / "dst"
    assert qr.prepare_rerun_workspace(str(src), str(dst), from_epoch=5)
    net = dst / "dbsr" / "default_synthetic"
    # ONLY the pre-damage checkpoint — the trainer must resume from it
    assert sorted(os.listdir(net)) == ["dbsr_synthetic_ep0005.ckpt"]
    assert (dst / "pwcnet" / "pretrain_synthetic" /
            "pwcnet_synth_ep0015.ckpt").exists()
    # val set shared via symlink: identical bursts => comparable dB
    assert os.path.islink(dst / "procedural_val")
    assert (dst / "procedural_val" / "gt").exists()
    # epoch-5 eval carried over; trajectory holds the LATEST epoch-5 row
    assert (dst / "eval_ep0005.json").exists()
    rows = [json.loads(l) for l in
            open(dst / "campaign_trajectory.jsonl")]
    assert rows == [{"epoch": 5, "psnr": 30.9}]


def test_prepare_is_idempotent_once_rerun_progressed(tmp_path):
    src = _make_src(tmp_path)
    dst = tmp_path / "dst"
    assert qr.prepare_rerun_workspace(str(src), str(dst), from_epoch=5)
    # rerun progressed to epoch 6; a queue relaunch must not clobber it
    (dst / "dbsr" / "default_synthetic" /
     "dbsr_synthetic_ep0006.ckpt").write_bytes(b"new")
    assert not qr.prepare_rerun_workspace(str(src), str(dst), from_epoch=5)
    assert (dst / "dbsr" / "default_synthetic" /
            "dbsr_synthetic_ep0006.ckpt").read_bytes() == b"new"


def test_wait_for_pidfile_exit_polls_until_dead(tmp_path):
    pidfile = tmp_path / "q.pid"
    pidfile.write_text(str(os.getpid()))  # "alive": this test process
    calls = []

    def fake_sleep(s):
        calls.append(s)
        if len(calls) == 3:
            pidfile.write_text("999999999")  # now dead

    qr.wait_for_pidfile_exit(str(pidfile), poll_s=1, sleep=fake_sleep)
    assert len(calls) == 3


def test_wait_returns_immediately_without_pidfile(tmp_path):
    qr.wait_for_pidfile_exit(str(tmp_path / "missing.pid"), poll_s=1,
                             sleep=lambda s: (_ for _ in ()).throw(
                                 AssertionError("should not sleep")))
