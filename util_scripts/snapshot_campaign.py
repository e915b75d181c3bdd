"""Reset-proof campaign snapshots: commit results into the repo as they
land.

Round 3 lost two campaign workspaces to VM resets — the completed
100-epoch run's checkpoints and the in-flight guarded rerun both lived
outside the repo and vanished; only numbers hand-copied into PERF.md
survived. This daemon closes that hole. It watches one campaign
workspace and:

  1. copies ``campaign_trajectory.jsonl`` to
     ``dbsr_tpu/artifacts/campaigns/<label>_trajectory.jsonl`` and
     commits it whenever new scored rows land (a few hundred bytes per
     eval point — cheap to commit every time);
  2. when the driver log says ``campaign complete``, exports the
     best-PSNR checkpoint params-only via
     ``util_scripts/export_best_dbsr.py`` into
     ``dbsr_tpu/artifacts/campaigns/<label>_best_params.ckpt`` and
     commits that too (ONE ~40 MB blob per campaign, never per epoch —
     repeated binary blobs would bloat the pack), then exits.

Commits are pathspec-scoped (``git commit -- <snapshot paths>``) so a
concurrent interactive session's staged or dirty files are never swept
into a snapshot commit, and retried on ``index.lock`` contention.

Usage (normally launched detached by ``session_queue.py``):
    python util_scripts/snapshot_campaign.py \
        --workspace /root/dbsr_campaign_r3d --label r3d [--interval 600]
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)

ART_DIR = os.path.join("dbsr_tpu", "artifacts", "campaigns")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_HERE, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def read_file(path: str):
    try:
        with open(path) as f:
            return f.read()
    except OSError:
        return None


def best_row(traj_text: str):
    """(epoch, psnr) of the best scored epoch, or None. Same dedup
    semantics as ``export_best_dbsr.best_epoch`` (last occurrence wins
    per epoch — restarted campaigns re-append early epochs), so the
    commit-message tag always matches what the exporter ships."""
    rows = {}
    for line in traj_text.splitlines():
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if "epoch" in r and "psnr" in r:
            rows[r["epoch"]] = r["psnr"]
    if not rows:
        return None
    e = max(rows, key=lambda k: rows[k])
    return e, rows[e]


def snapshot_trajectory(ws: str, dest: str):
    """Copy the workspace trajectory to ``dest`` if its content changed.
    Returns the new text when updated, else None."""
    src = read_file(os.path.join(ws, "campaign_trajectory.jsonl"))
    if src is None or src == read_file(dest):
        return None
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    with open(tmp, "w") as f:
        f.write(src)
    os.replace(tmp, dest)
    return src


def git_commit(paths, msg, cwd=REPO, run=subprocess.run, retries=6,
               sleep=time.sleep) -> str:
    """``git add`` + pathspec-scoped commit of exactly ``paths``;
    retried on index-lock contention with a concurrent session. Returns
    ``'committed'`` (a commit was created), ``'clean'`` (nothing to
    commit — the content is already in git), or ``'failed'`` (the
    content is NOT in git; callers must retry later — treating this as
    success would leave the artifact inside the VM-reset loss window
    this daemon exists to close)."""
    rel = [os.path.relpath(p, cwd) for p in paths]
    for attempt in range(retries):
        add = run(["git", "add", "--"] + rel, cwd=cwd,
                  capture_output=True, text=True)
        com = run(["git", "commit", "-m", msg, "--"] + rel, cwd=cwd,
                  capture_output=True, text=True)
        if add.returncode == 0 and com.returncode == 0:
            return "committed"
        blob = add.stderr + com.stderr + com.stdout
        if "nothing to commit" in blob or "no changes added" in blob:
            return "clean"
        if "index.lock" in blob and attempt < retries - 1:
            sleep(5)
            continue
        print(f"snapshot commit failed (rc={com.returncode}): "
              f"{blob.strip()[:400]}", flush=True)
        return "failed"
    return "failed"


def snapshot_step(ws: str, label: str, exported: bool,
                  commit=git_commit, export=None, complete=None) -> bool:
    """One poll: trajectory snapshot + (on completion) best-params
    export. Returns the new ``exported`` state."""
    cq = _load("chip_queue")
    complete = complete if complete is not None else cq.campaign_complete
    traj_dest = os.path.join(REPO, ART_DIR, f"{label}_trajectory.jsonl")
    text = snapshot_trajectory(ws, traj_dest)
    if text is not None:
        best = best_row(text)
        tag = (f"epoch {best[0]}, best {best[1]:.2f} dB"
               if best else "no scored rows yet")
        commit([traj_dest],
               f"Snapshot campaign {label} trajectory ({tag})")
    if exported or not complete(ws):
        return exported
    ckpt = os.path.join(REPO, ART_DIR, f"{label}_best_params.ckpt")
    if export is None:
        def export(ws=ws, out=ckpt):
            return _load("export_best_dbsr").main(
                ["--workspace", ws, "--out", out])
    try:
        export()
    except Exception as e:  # traj present but no checkpoint: retry later
        print(f"best-params export failed ({e}); will retry", flush=True)
        return False
    best = best_row(read_file(traj_dest) or "")
    tag = f"epoch {best[0]}, {best[1]:.2f} dB" if best else "untracked best"
    # exported=True only once the params blob is actually IN git
    # ('committed', or 'clean' on a re-run after a prior commit landed);
    # on 'failed' (e.g. index.lock contention outlasting the retry
    # budget) keep polling and retry the commit next round.
    status = commit([ckpt, os.path.join(REPO, ART_DIR,
                                        f"{label}_trajectory.jsonl")],
                    f"Snapshot campaign {label} best checkpoint ({tag})")
    return status in ("committed", "clean")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--label", required=True)
    ap.add_argument("--interval", type=int, default=600)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args(argv)

    ws = os.path.abspath(args.workspace)
    exported = False
    while True:
        try:
            exported = snapshot_step(ws, args.label, exported)
        except Exception as e:  # daemon must outlive transient errors
            print(f"snapshot step error: {e}", flush=True)
        if exported or args.once:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
