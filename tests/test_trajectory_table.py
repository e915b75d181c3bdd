import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "trajectory_table",
    os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                 "trajectory_table.py"))
tt = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tt)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_dedupes_rescored_epochs_keeping_latest(tmp_path):
    # A restarted campaign re-appends early epochs; the latest line per
    # epoch must win.
    p = tmp_path / "traj.jsonl"
    _write(p, [
        {"epoch": 5, "psnr": 30.0, "ssim": 0.90, "time": "a"},
        {"epoch": 10, "psnr": 31.0, "ssim": 0.91, "time": "a"},
        {"epoch": 5, "psnr": 30.5, "ssim": 0.905, "time": "b"},
    ])
    rows = tt.load_rows(str(p))
    assert [r["epoch"] for r in rows] == [5, 10]
    assert rows[0]["psnr"] == 30.5


def test_format_table_every_and_last(tmp_path):
    rows = [{"epoch": e, "psnr": 30 + e / 10, "ssim": 0.9}
            for e in (5, 10, 15, 20, 23)]
    out = tt.format_table(rows, every=10, keep_last=True)
    lines = out.splitlines()
    assert lines[0] == "| epoch | PSNR (dB) | SSIM |"
    # epochs 10, 20 pass the filter; 23 appended as the final row
    assert [l.split("|")[1].strip() for l in lines[2:]] == ["10", "20", "23"]
    assert "| 10 | 31.00 | 0.9000 |" in out


def test_cli_smoke(tmp_path, capsys):
    p = tmp_path / "traj.jsonl"
    _write(p, [{"epoch": 5, "psnr": 30.9, "ssim": 0.9037, "time": "t"}])
    tt.main([str(p)])
    out = capsys.readouterr().out
    assert "| 5 | 30.90 | 0.9037 |" in out


def test_cli_empty(tmp_path, capsys):
    p = tmp_path / "traj.jsonl"
    p.write_text("")
    tt.main([str(p)])
    assert "no trajectory rows" in capsys.readouterr().out
