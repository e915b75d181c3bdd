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
  2. banks the best-PSNR checkpoint params-only (via
     ``util_scripts/export_best_dbsr.py``) into
     ``dbsr_tpu/artifacts/campaigns/<label>_best_params.ckpt`` and
     commits it — MID-FLIGHT whenever the best scored epoch beats the
     banked one by ``MIDFLIGHT_MARGIN_DB`` (rate-limited to one blob
     per ``MIDFLIGHT_SPACING_S``: binary blobs bloat the pack, so the
     margin+spacing bound the count to a handful per campaign), and
     unconditionally at ``campaign complete``, then exits. Round 4
     lost a 37.31 dB epoch-60 checkpoint to a VM reset because banking
     only happened at completion; mid-flight banking caps the loss
     window at ~max(spacing, margin) of progress.

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


MIDFLIGHT_MARGIN_DB = 0.05   # min PSNR gain before re-banking in-flight
#                              (params-only blobs measure ~17 MB; since the
#                              banked best is now also the campaign's
#                              reset-RESUME point, a tighter margin directly
#                              caps the post-reset replay cost. 0.25 dB cost
#                              round 5 twenty-five epochs: epoch 70's
#                              37.39 dB was +0.235 over the epoch-45 bank —
#                              under the margin — when VM reset #4 landed)
MIDFLIGHT_SPACING_S = 900.0   # min seconds between in-flight blobs


def _traj_rows(traj_text: str) -> dict:
    """{epoch: psnr} with last-occurrence-wins per epoch (restarted
    campaigns re-append early epochs) — the same dedup semantics as
    ``export_best_dbsr.best_epoch``."""
    rows = {}
    for line in traj_text.splitlines():
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if "epoch" in r and "psnr" in r:
            rows[r["epoch"]] = r["psnr"]
    return rows


def best_row(traj_text: str):
    """(epoch, psnr) of the best scored epoch, or None — matches what
    the exporter ships, so commit-message tags never disagree."""
    rows = _traj_rows(traj_text)
    if not rows:
        return None
    e = max(rows, key=lambda k: rows[k])
    return e, rows[e]


def banked_psnr(ckpt: str, traj_text: str):
    """Trajectory PSNR of the epoch currently banked in the params
    artifact, or None (no artifact / unreadable header / epoch no
    longer in the trajectory). Re-derived from the artifact itself so a
    restarted daemon knows what is already safe without local state."""
    if not os.path.exists(ckpt):
        return None
    try:
        from dbsr_tpu.training.checkpoint import _read
        epoch = _read(ckpt)[0].get("epoch")
    except Exception:
        return None
    return _traj_rows(traj_text).get(epoch)


def _uncommitted(path: str) -> bool:
    """True when ``path`` differs from git HEAD (a prior export whose
    commit never landed — e.g. index.lock contention)."""
    r = subprocess.run(
        ["git", "status", "--porcelain", "--", os.path.relpath(path, REPO)],
        cwd=REPO, capture_output=True, text=True)
    return r.returncode == 0 and bool(r.stdout.strip())


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
                  commit=git_commit, export=None, complete=None,
                  now=time.time) -> bool:
    """One poll: trajectory snapshot + best-params banking (mid-flight
    on margin+spacing, unconditional at completion). Returns the new
    ``exported`` state (True only once the FINAL export is in git —
    the daemon's exit condition)."""
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
    if exported:
        return True
    traj_text = read_file(traj_dest) or ""
    best = best_row(traj_text)
    if best is None:
        return False
    ckpt = os.path.join(REPO, ART_DIR, f"{label}_best_params.ckpt")
    done = complete(ws)
    skip_export = False
    if not done:
        prev = banked_psnr(ckpt, traj_text)
        improved = prev is None or best[1] >= prev + MIDFLIGHT_MARGIN_DB
        spaced = not os.path.exists(ckpt) or \
            now() - os.path.getmtime(ckpt) >= MIDFLIGHT_SPACING_S
        if improved and spaced:
            pass  # bank a new in-flight best below
        elif os.path.exists(ckpt) and _uncommitted(ckpt):
            skip_export = True  # a prior export never landed in git:
            #                     retry just the commit
        else:
            return False
    if export is None:
        def export(ws=ws, out=ckpt):
            return _load("export_best_dbsr").main(
                ["--workspace", ws, "--out", out])
    if not skip_export:
        try:
            export()
        except Exception as e:  # traj present but no ckpt: retry later
            print(f"best-params export failed ({e}); will retry",
                  flush=True)
            return False
    best = best_row(read_file(traj_dest) or "")
    tag = f"epoch {best[0]}, {best[1]:.2f} dB" if best else "untracked best"
    phase = "best checkpoint" if done else "in-flight best checkpoint"
    # exported=True only once the campaign is COMPLETE and the params
    # blob is actually IN git ('committed', or 'clean' on a re-run after
    # a prior commit landed); on 'failed' (e.g. index.lock contention
    # outlasting the retry budget) keep polling and retry next round.
    status = commit([ckpt, traj_dest],
                    f"Snapshot campaign {label} {phase} ({tag})")
    return done and status in ("committed", "clean")


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
            # heartbeat EVERY poll: an empty log file is otherwise
            # indistinguishable from a dead daemon (round 4's judging
            # found exactly that ambiguity on the live campaign)
            traj = read_file(os.path.join(ws, "campaign_trajectory.jsonl"))
            rows = _traj_rows(traj) if traj else {}
            best = (max(rows.values()), max(rows, key=rows.get)) \
                if rows else None
            print(f"[{time.strftime('%F %T')}] poll ok: "
                  f"{len(rows)} scored rows"
                  + (f", best {best[0]:.2f} dB @ epoch {best[1]}"
                     if best else "")
                  + f", exported={exported}", flush=True)
        except Exception as e:  # daemon must outlive transient errors
            print(f"[{time.strftime('%F %T')}] snapshot step error: {e}",
                  flush=True)
        if exported or args.once:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
