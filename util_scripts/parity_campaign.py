"""Parity training campaign driver (the reference's flagship schedule,
zero-egress).

Reproduces the reference's published training protocol
(``/root/reference/train_settings/dbsr/default_synthetic.py:26-100`` —
100 epochs x 1000 steps x B=16, Adam 1e-4 StepLR(40, 0.2), frozen
pretrained aligner per ``models/dbsr/dbsrnet.py:44,59-60``) end to end on
one TPU chip, with procedural dead-leaves source imagery standing in for
Zurich when none is staged:

  1. pretrain PWC on the synthesis pipeline's exact flow labels
     (``pwcnet/pretrain_synthetic``; skipped if a checkpoint exists);
  2. generate a FROZEN SyntheticBurstVal-format val set (default 300
     bursts, STRICT degradation kernel — eval bursts are always strict);
  3. run ``dbsr/default_synthetic`` in resumable chunks, scoring the
     latest checkpoint through the real eval CLI (boundary 40, 2^14
     quantize) after each chunk;
  4. append {epoch, psnr, ssim, ...} lines to
     ``<workspace>/campaign_trajectory.jsonl``.

Every stage is a SUBPROCESS with a timeout: a wedged relay kills the
chunk and the next attempt resumes exactly from the last checkpoint
(trainer resume + idempotent pretrain/valgen). Safe to re-run at any
point; it continues where it left off.

Usage:
    python util_scripts/parity_campaign.py --workspace /root/campaign \
        [--epochs 100] [--chunk 5] [--eval_every 5] [--val_bursts 300]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# self-contained launch: `python util_scripts/parity_campaign.py` puts
# util_scripts/ (not the repo root) on sys.path, and the launcher's env
# may not carry PYTHONPATH=/root/repo (the rerun queue learned this the
# hard way: run_with_retries crashed on `import dbsr_tpu` because the
# only other insert lived behind an early return in seed_pretrained_flow)
sys.path.insert(0, REPO)


def sh(args, timeout, env, log_path):
    print(f"+ {' '.join(args)} (timeout {timeout}s)", flush=True)
    with open(log_path, "a") as log:
        log.write(f"\n===== {time.strftime('%F %T')} {' '.join(args)}\n")
        log.flush()
        try:
            p = subprocess.run(args, cwd=REPO, env=env, stdout=log,
                               stderr=subprocess.STDOUT, timeout=timeout)
            return p.returncode
        except subprocess.TimeoutExpired:
            print(f"  TIMEOUT after {timeout}s (see {log_path})", flush=True)
            return -1


def pending_eval_epochs(eval_every, now, scored):
    """Eval points (multiples of ``eval_every``, <= ``now``) whose epoch
    is not in ``scored`` (a container of already-scored epochs)."""
    return [e for e in range(eval_every, now + 1, eval_every)
            if e not in scored]


def trajectory_rows(scores, epochs):
    """Per-epoch trajectory rows from a ``compute_score_trajectory`` JSON
    dict ``{metric: {"<net>_epNNNN": value}}``. Raises if any requested
    epoch has no scores (missing checkpoint upstream)."""
    rows = []
    for epoch in epochs:
        suffix = f"_ep{epoch:04d}"
        row = {"epoch": epoch}
        for metric, per_net in scores.items():
            vals = [v for k, v in per_net.items() if k.endswith(suffix)]
            if vals:
                row[metric] = vals[0]
        if len(row) == 1:
            raise RuntimeError(
                f"trajectory eval returned no scores for epoch {epoch} "
                "(missing checkpoint?)")
        rows.append(row)
    return rows


def train_argv(py, target_epochs, train_set=()):
    """run_training argv for one campaign chunk; ``train_set`` items are
    extra ``--set k=v`` overrides (e.g. ``seed=2`` for a seed-variance
    arm scoring on the same frozen val set)."""
    argv = [py, "run_training.py", "dbsr", "default_synthetic",
            "--set", f"epochs={target_epochs}"]
    for kv in train_set:
        argv += ["--set", kv]
    return argv


def latest_epoch(ws, sub, name):
    import glob
    import re
    best = 0
    for p in glob.glob(os.path.join(ws, sub, f"{name}_ep*.ckpt")):
        m = re.search(r"_ep(\d+)\.ckpt$", p)
        if m:
            best = max(best, int(m.group(1)))
    return best


class EvalWorkerClient:
    """Drive a persistent eval worker (``util_scripts/eval_worker.py``)
    from the campaign: launch it lazily, retire orphans from previous
    driver incarnations, send score requests over the file RPC, and fall
    back cleanly (returning False) so the caller can use the one-shot
    subprocess eval when the worker is unhealthy."""

    def __init__(self, ws: str, env, log_path: str, py: str,
                 poll_s: float = 2.0, now=time.time, sleep=time.sleep):
        self.root = os.path.join(ws, "eval_worker")
        self.env = env
        self.log_path = log_path
        self.py = py
        self.poll_s = poll_s
        self._now = now
        self._sleep = sleep
        self.proc = None
        self.rpc_dir = None
        self._seq = 0
        # retire orphaned workers from a previous (crashed) driver: each
        # incarnation gets its own subdir, so a stop file in every
        # existing one reaches whatever may still be polling
        if os.path.isdir(self.root):
            for d in os.listdir(self.root):
                sub = os.path.join(self.root, d)
                if os.path.isdir(sub):
                    with open(os.path.join(sub, "stop"), "w"):
                        pass

    def _alive(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def _ensure_ready(self, timeout: float) -> bool:
        if not self._alive():
            self.rpc_dir = os.path.join(
                self.root, f"w{int(self._now())}")
            os.makedirs(self.rpc_dir, exist_ok=True)
            log = open(self.log_path, "a")
            self.proc = subprocess.Popen(
                [self.py, "util_scripts/eval_worker.py",
                 "--dir", self.rpc_dir],
                cwd=REPO, env=self.env, stdout=log,
                stderr=subprocess.STDOUT)
            print(f"eval worker launched (pid {self.proc.pid}, "
                  f"rpc {self.rpc_dir})", flush=True)
        deadline = self._now() + timeout
        ready = os.path.join(self.rpc_dir, "ready")
        while self._now() < deadline:
            if os.path.exists(ready):
                return True
            if not self._alive():
                print("eval worker died before ready", flush=True)
                return False
            self._sleep(self.poll_s)
        print(f"eval worker not ready within {timeout}s", flush=True)
        self.kill()
        return False

    def score(self, epochs, out_json: str, timeout: float) -> bool:
        """Request a scoring; True iff ``out_json`` was written OK."""
        try:
            if not self._ensure_ready(timeout):
                return False
            self._seq += 1
            rid = f"{self._seq:06d}"
            tmp = os.path.join(self.rpc_dir, f".req_{rid}.tmp")
            with open(tmp, "w") as f:
                json.dump({"epochs": list(epochs),
                           "out_json": out_json}, f)
            os.rename(tmp, os.path.join(self.rpc_dir, f"req_{rid}.json"))
            done = os.path.join(self.rpc_dir, f"done_{rid}.json")
            deadline = self._now() + timeout
            while self._now() < deadline:
                if os.path.exists(done):
                    with open(done) as f:
                        result = json.load(f)
                    if not result.get("ok"):
                        print(f"eval worker request failed: "
                              f"{result.get('error')}", flush=True)
                    return bool(result.get("ok")) and \
                        os.path.exists(out_json)
                if not self._alive():
                    print("eval worker died mid-request", flush=True)
                    return False
                self._sleep(self.poll_s)
            # a timed-out worker could still write out_json later and
            # race the fallback eval — kill it first
            print(f"eval worker request timed out ({timeout}s)",
                  flush=True)
            self.kill()
            return False
        except Exception as e:
            print(f"eval worker client error: {e}", flush=True)
            self.kill()
            return False

    def kill(self):
        if self._alive():
            self.proc.kill()
            self.proc.wait()
        self.proc = None

    def stop(self):
        """Graceful end-of-campaign shutdown (releases the worker's HBM
        residency)."""
        if self.rpc_dir and self._alive():
            with open(os.path.join(self.rpc_dir, "stop"), "w"):
                pass
            try:
                self.proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                self.kill()
        else:
            self.kill()


# aligner kind -> (config module, workspace subdir, net_name, artifact)
ALIGNERS = {
    "pwc": ("pwcnet", os.path.join("pwcnet", "pretrain_synthetic"),
            "pwcnet_synth", "pwcnet_synth_params.ckpt"),
    "lite": ("align_lite", os.path.join("align_lite", "pretrain_synthetic"),
             "align_lite", "align_lite_params.ckpt"),
}


def seed_pretrained_flow(ws: str, artifact: str, pwc_epochs: int,
                         subdir: str = "pwcnet/pretrain_synthetic",
                         net_name: str = "pwcnet_synth") -> str:
    """Seed a wiped workspace's pretrain directory from the repo-baked
    params-only artifact (reset recovery). Only seeds when the workspace
    has NO pretrain checkpoint and the artifact's epoch meets the target
    (a short artifact would make the driver try to RESUME training from
    params-only graft material, which trainers refuse). Returns the
    seeded path or ''."""
    if latest_epoch(ws, subdir, net_name) > 0 \
            or not os.path.exists(artifact):
        return ""
    sys.path.insert(0, REPO)
    from dbsr_tpu.training.checkpoint import _read
    epoch = _read(artifact)[0]["epoch"]
    if epoch < pwc_epochs:
        return ""
    import shutil
    pwc_dir = os.path.join(ws, subdir)
    os.makedirs(pwc_dir, exist_ok=True)
    dst = os.path.join(pwc_dir, f"{net_name}_ep{epoch:04d}.ckpt")
    shutil.copyfile(artifact, dst)
    return dst


def seed_dbsr_from_bank(ws: str) -> str:
    """Reseed a WIPED workspace's DBSR checkpoint dir from the repo's
    git-banked campaign best (params-only artifact written by the
    snapshot daemon). The trainer grafts the params at their recorded
    epoch with a fresh optimizer and a fast-forwarded LR step
    (``Trainer._resume_params_only``), so a VM reset now costs at most
    the snapshot daemon's margin+spacing banking window instead of the
    whole campaign — round 4 lost 60 epochs to exactly this. Restores
    the banked trajectory + per-epoch eval markers alongside, so the
    relaunched driver does not try to re-score epochs whose full
    checkpoints no longer exist. Returns the seeded path or ''."""
    if latest_epoch(ws, "dbsr/default_synthetic", "dbsr_synthetic") > 0:
        return ""
    label = os.path.basename(os.path.normpath(ws))
    art_dir = os.path.join(REPO, "dbsr_tpu", "artifacts", "campaigns")
    bank = os.path.join(art_dir, f"{label}_best_params.ckpt")
    if not os.path.exists(bank):
        return ""
    from dbsr_tpu.training.checkpoint import read_header
    epoch = int(read_header(bank).get("epoch", 0))
    if epoch <= 0:
        return ""
    import shutil
    dst_dir = os.path.join(ws, "dbsr", "default_synthetic")
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, f"dbsr_synthetic_ep{epoch:04d}.ckpt")
    shutil.copyfile(bank, dst)
    traj_bank = os.path.join(art_dir, f"{label}_trajectory.jsonl")
    if os.path.exists(traj_bank):
        shutil.copyfile(traj_bank,
                        os.path.join(ws, "campaign_trajectory.jsonl"))
        # restore eval markers only UP TO the banked resume epoch:
        # trajectory rows beyond it belong to the lost lineage (their
        # checkpoints are gone), and the replayed epochs must be
        # re-scored so (a) the trajectory reflects the lineage actually
        # trained and (b) the snapshot daemon gets banking points
        # DURING the replay window instead of only after the old best
        # is surpassed
        with open(traj_bank) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if "epoch" in row and row["epoch"] <= epoch:
                    marker = os.path.join(
                        ws, f"eval_ep{row['epoch']:04d}.json")
                    with open(marker, "w") as m:
                        json.dump(row, m)
    return dst


def kill_stray_trainers(ws: str, log=print, proc: str = "/proc",
                        kill=os.kill) -> list:
    """Kill any run_training process bound to workspace ``ws`` that this
    driver does not own (matched by its ``DBSR_TPU_WORKSPACE_DIR`` env,
    never by name alone). A driver killed between wait_backend and its
    monitor loop leaves an ORPHAN trainer; the relaunched driver would
    then start a second one and the two race on one chip and one
    checkpoint directory (observed live in round 5). Returns the pids
    killed."""
    me = os.getpid()
    want = os.path.normpath(ws)
    killed = []
    for pid in os.listdir(proc):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(os.path.join(proc, pid, "cmdline"), "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "run_training.py" not in cmd:
                continue
            with open(os.path.join(proc, pid, "environ"), "rb") as f:
                envblob = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if f"DBSR_TPU_WORKSPACE_DIR={want}\0" not in envblob + "\0":
            continue
        try:
            kill(int(pid), 9)
            killed.append(int(pid))
            log(f"killed stray trainer pid={pid} for {want}")
        except OSError:
            pass
    return killed


def _cpu_seconds(pid, proc: str = "/proc"):
    """utime+stime of ``pid`` in seconds, or None when unreadable."""
    try:
        with open(os.path.join(proc, str(pid), "stat")) as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return None


def resident_training(ws, epochs, argv, env, log_path, stall_timeout,
                      max_retries, eval_batch, pending_evals, eval_epochs,
                      poll_s: float = 20.0, popen=None, sleep=time.sleep,
                      now=time.time, wait_backend=None,
                      cpu_probe=_cpu_seconds, freeze_timeout: float = 600.0):
    """RESIDENT training: ONE subprocess driven to the final epoch — the
    compiled step, staged pools and process state stay resident across
    the whole campaign (the per-chunk ~380 s startup tax becomes a
    one-time cost). The driver monitors checkpoint files for progress; a
    stall (no new checkpoint in ``stall_timeout``) or a crash kills/
    loses the process and a relaunch resumes from the latest checkpoint.
    Evals fire CONCURRENTLY as checkpoints land (the eval worker is its
    own process; chip residency coexists — proven by round 3's campaign,
    where the worker stayed resident across chunks). A relaunched driver
    fires any eval BACKLOG immediately (round 4's r4mix campaign sat at
    epoch 19 with zero scored rows because pending points only fired on
    a new-checkpoint tick once they numbered >= eval_batch). The retry
    budget counts only launches that exit abnormally with ZERO new
    checkpoints; any progress resets it."""
    if wait_backend is None:
        from dbsr_tpu.utils.backend_probe import wait_for_backend
        wait_backend = wait_for_backend
    popen = popen or subprocess.Popen
    attempts_left = max_retries

    def current():
        return latest_epoch(ws, "dbsr/default_synthetic", "dbsr_synthetic")

    while current() < epochs:
        wait_backend(log=lambda m: print(f"train: {m}", flush=True))
        kill_stray_trainers(ws, log=lambda m: print(m, flush=True))
        print(f"+ {' '.join(argv)} (resident)", flush=True)
        log = open(log_path, "a")
        log.write(f"\n===== {time.strftime('%F %T')} {' '.join(argv)} "
                  "(resident)\n")
        log.flush()
        proc = popen(argv, cwd=REPO, env=env, stdout=log,
                     stderr=subprocess.STDOUT)
        start_epoch = last = current()
        t_progress = now()
        stalled = False
        cpu_last, t_cpu = None, now()
        backlog = pending_evals(last)
        if backlog:
            # score the backlog of a relaunched/restarted driver right
            # away (concurrent with the trainer's startup compile)
            eval_epochs(backlog)
            t_progress = now()  # eval time is not trainer stall time
        while proc.poll() is None:
            sleep(poll_s)
            # Relay-wedge detection, independent of checkpoint cadence:
            # a trainer stuck on a dead relay socket sleeps with FROZEN
            # host CPU time. Every healthy phase — staging's many small
            # device calls, step dispatch, even the cold-cache compile
            # sequence (small compiles interleaved with device setup) —
            # accrues host CPU continuously; round 5 measured wedged
            # trainers at <0.2 cpu-s over 10 wall-minutes. Killing on a
            # long CPU freeze turns a 30-min first-checkpoint stall
            # window into ~freeze_timeout of lost time per wedge.
            cpu = cpu_probe(getattr(proc, "pid", None))
            if cpu is not None:
                # liveness = sustained >=2% host CPU (wedged trainers
                # idle at ~0.3% of background-thread noise; healthy
                # staging runs at ~15-20%, steady-state dispatch above
                # 2%); checkpoint progress below also resets the clock,
                # so only the pre-first-checkpoint phase relies on this
                # rate alone
                if cpu_last is None or cpu - cpu_last >= max(
                        1.0, 0.02 * (now() - t_cpu)):
                    cpu_last, t_cpu = cpu, now()
                elif now() - t_cpu > freeze_timeout:
                    print(f"trainer cpu-frozen for {freeze_timeout:.0f}s "
                          "(relay wedge); relaunching", flush=True)
                    proc.kill()
                    proc.wait()
                    stalled = True
                    break
            cur = current()
            if cur > last:
                last, t_progress = cur, now()
                if cpu is not None:
                    cpu_last, t_cpu = cpu, now()  # ckpt progress = alive
                attempts_left = max_retries  # progress resets the budget
                pend = pending_evals(cur)
                if len(pend) >= eval_batch:
                    eval_epochs(pend)  # concurrent with training
                    t_progress = now()  # a long eval blocks this monitor
                    #                     loop, not the trainer: give the
                    #                     stall clock a fresh window
            elif now() - t_progress > (stall_timeout if cur > start_epoch
                                       else 2 * stall_timeout):
                # a fresh process's FIRST checkpoint rides a cold-cache
                # remote compile (measured 14 min post-VM-reset under
                # host CPU load — round 5's relaunch was stall-killed
                # the moment it finished compiling); give it a doubled
                # window, steady-state keeps stall_timeout
                print(f"trainer stalled (no checkpoint past epoch {last} "
                      f"in {stall_timeout}s); relaunching", flush=True)
                proc.kill()
                proc.wait()
                stalled = True
                break
        log.close()
        if not stalled and proc.returncode not in (0, None) and \
                current() <= start_epoch:
            attempts_left -= 1
            print(f"trainer exited rc={proc.returncode} without progress "
                  f"({attempts_left} attempts left)", flush=True)
            if attempts_left <= 0:
                raise RuntimeError(
                    f"resident training failed repeatedly; see {log_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=5,
                    help="epochs per training subprocess")
    ap.add_argument("--eval_every", type=int, default=5)
    ap.add_argument("--eval_batch", type=int, default=2,
                    help="trajectory-score checkpoints in batches of this "
                         "many eval points (one eval process pays the "
                         "val-set staging + compile retrieval ONCE per "
                         "batch instead of per checkpoint). Keep small: "
                         "round 4 lost a campaign with ZERO scored rows "
                         "because batch=4 x eval_every=5 deferred the "
                         "first eval to epoch 20 and a reset hit at 19")
    ap.add_argument("--val_bursts", type=int, default=300)
    ap.add_argument("--aligner", choices=sorted(ALIGNERS), default="lite",
                    help="pretrained aligner kind: 'lite' (AlignLite — "
                         "reaches sub-pixel EPE on this regime; default) "
                         "or 'pwc' (reference architecture; converges to "
                         "the zero-flow baseline when trained here)")
    ap.add_argument("--pwc_epochs", type=int, default=15)
    ap.add_argument("--no_resident", action="store_true",
                    help="disable resident training (fall back to one "
                         "subprocess per --chunk epochs; resident mode "
                         "amortizes the ~380 s per-chunk startup into "
                         "ONE process and fires evals concurrently as "
                         "checkpoints land)")
    ap.add_argument("--stall_timeout", type=int, default=900,
                    help="resident mode: relaunch the trainer if no new "
                         "checkpoint lands within this many seconds "
                         "(steady epochs are ~160 s; 900 s rides out "
                         "eval-concurrency stretches but caps the idle "
                         "cost of a wedged-relay outage)")
    ap.add_argument("--chunk_timeout", type=int, default=7200)
    ap.add_argument("--eval_timeout", type=int, default=3600)
    ap.add_argument("--max_retries", type=int, default=3,
                    help="consecutive failed/hung attempts per stage")
    ap.add_argument("--no_worker", action="store_true",
                    help="disable the persistent eval worker (always use "
                         "one-shot trajectory-eval subprocesses)")
    ap.add_argument("--train_set", action="append", default=[],
                    metavar="K=V",
                    help="extra --set override for every training stage "
                         "(repeatable; e.g. --train_set seed=2 for a "
                         "seed-variance campaign on the same val set)")
    args = ap.parse_args()

    ws = os.path.abspath(args.workspace)
    os.makedirs(ws, exist_ok=True)
    log_path = os.path.join(ws, "campaign.log")
    traj_path = os.path.join(ws, "campaign_trajectory.jsonl")
    val_dir = os.path.join(ws, "procedural_val")

    env = dict(os.environ)
    env["DBSR_TPU_WORKSPACE_DIR"] = ws
    env["DBSR_TPU_TENSORBOARD_DIR"] = os.path.join(ws, "tensorboard")
    env["DBSR_TPU_SYNBURSTVAL_DIR"] = val_dir
    py = sys.executable

    def run_with_retries(argv, timeout, what):
        from dbsr_tpu.utils.backend_probe import backend_ready, \
            wait_for_backend
        attempt = 0
        while attempt < args.max_retries:
            # A backend outage (relay/tunnel down) is not a stage failure:
            # pause the retry clock until the accelerator is reachable
            # again, instead of burning bounded attempts on claims that
            # block for ~25 min and then fail UNAVAILABLE.
            wait_for_backend(log=lambda m: print(f"{what}: {m}", flush=True))
            rc = sh(argv, timeout, env, log_path)
            if rc == 0:
                return
            if not backend_ready():
                print(f"{what}: rc={rc} during a backend outage — attempt "
                      "not counted", flush=True)
                continue
            attempt += 1
            print(f"{what}: attempt {attempt} rc={rc}; retrying", flush=True)
        raise RuntimeError(f"{what} failed {args.max_retries} times; "
                           f"see {log_path}")

    # ---- 1. aligner pretraining (idempotent: resumes / no-ops when done)
    # A wiped workspace (VM reset) is reseeded from the repo-baked
    # params-only artifact when one exists at the target epoch count —
    # skips the pretrain stage and keeps the protocol identical.
    module, subdir, net_name, artifact_name = ALIGNERS[args.aligner]
    artifact = os.path.join(REPO, "dbsr_tpu", "artifacts", artifact_name)
    seeded = seed_pretrained_flow(ws, artifact, args.pwc_epochs,
                                  subdir=subdir, net_name=net_name)
    if seeded:
        print(f"seeded pretrained flow from repo artifact ({seeded})",
              flush=True)
    if latest_epoch(ws, subdir, net_name) < args.pwc_epochs:
        run_with_retries(
            [py, "run_training.py", module, "pretrain_synthetic",
             "--set", f"epochs={args.pwc_epochs}"],
            args.chunk_timeout, "aligner pretrain")
        rc = sh([py, "util_scripts/export_pretrained_flow.py",
                 "--workspace", ws, "--aligner", args.aligner],
                600, env, log_path)
        print(f"pretrained-flow artifact export rc={rc} "
              "(commit dbsr_tpu/artifacts/ to make it reset-proof)",
              flush=True)
    print(f"aligner pretrain done ({args.aligner})", flush=True)

    # ---- 2. frozen procedural val set (strict kernel) ----
    if not os.path.exists(os.path.join(
            val_dir, "gt", f"{args.val_bursts - 1:04d}", "meta_info.pkl")):
        run_with_retries(
            [py, "util_scripts/generate_synthetic_burst_val.py",
             "--procedural", str(max(args.val_bursts // 2, 1)),
             "--out_dir", val_dir, "--num_bursts", str(args.val_bursts),
             "--seed", "20260817"],
            args.eval_timeout, "val set generation")
    print("val set ready", flush=True)

    seeded_dbsr = seed_dbsr_from_bank(ws)
    if seeded_dbsr:
        print(f"seeded DBSR campaign state from git bank ({seeded_dbsr}); "
              "trainer resumes params-only with a fresh optimizer",
              flush=True)

    def eval_marker(epoch):
        return os.path.join(ws, f"eval_ep{epoch:04d}.json")

    def pending_evals(now):
        scored = {e for e in range(args.eval_every, now + 1,
                                   args.eval_every)
                  if os.path.exists(eval_marker(e))}
        return pending_eval_epochs(args.eval_every, now, scored)

    worker = None if args.no_worker else \
        EvalWorkerClient(ws, env, log_path, py)

    def eval_epochs(epochs, fatal=False):
        """Score a BATCH of checkpoints, preferring the persistent eval
        worker (val set stays staged in HBM + compiled graph reused
        ACROSS batches for the whole campaign) with the one-shot
        trajectory-eval subprocess as fallback (that one still pays
        ~30s compile retrieval + ~150s val-set transfer per invocation
        over the relay). Per-epoch JSON markers keep resumption
        idempotent at eval-point granularity.

        Mid-campaign eval failures are NON-fatal (``fatal=False``): the
        epochs stay pending and are retried on later ticks — an eval
        problem must never take the resident trainer's driver down with
        it. Only the end-of-campaign sweep passes ``fatal=True``."""
        if not epochs:
            return
        try:
            out_json = os.path.join(
                ws, f"eval_traj_{epochs[0]:04d}_{epochs[-1]:04d}.json")
            done = worker is not None and \
                worker.score(epochs, out_json, args.eval_timeout)
            if not done:
                run_with_retries(
                    [py, "run_evaluation.py", "synburst", "compute_score",
                     "dbsr_default", "--no_lpips", "--all_epochs",
                     "--epochs", ",".join(str(e) for e in epochs),
                     "--json", out_json],
                    args.eval_timeout, f"eval@{epochs}")
            with open(out_json) as f:
                scores = json.load(f)
            rows = trajectory_rows(scores, epochs)
        except Exception as e:
            if fatal:
                raise
            print(f"eval@{epochs} failed non-fatally ({e}); epochs stay "
                  "pending and retry on the next tick", flush=True)
            return
        for row in rows:
            epoch = row["epoch"]
            row["time"] = time.strftime("%F %T")
            suffix = f"_ep{epoch:04d}"
            with open(eval_marker(epoch), "w") as f:
                json.dump({m: {f"dbsr_default_synthetic{suffix}": row[m]}
                           for m in scores}, f, indent=2)
            with open(traj_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"trajectory: {row}", flush=True)

    # ---- 3. training + batched periodic eval ----
    if args.no_resident:
        # one subprocess per --chunk epochs (each pays ~380 s of process
        # startup + compile retrieval); evals between chunks
        while True:
            done = latest_epoch(ws, "dbsr/default_synthetic",
                                "dbsr_synthetic")
            if done >= args.epochs:
                break
            target = min(done + args.chunk, args.epochs)
            run_with_retries(train_argv(py, target, args.train_set),
                             args.chunk_timeout, f"train to {target}")
            now = latest_epoch(ws, "dbsr/default_synthetic",
                               "dbsr_synthetic")
            pend = pending_evals(now)
            if len(pend) >= args.eval_batch or now >= args.epochs:
                eval_epochs(pend)
    else:
        resident_training(
            ws, args.epochs, train_argv(py, args.epochs, args.train_set),
            env, log_path, args.stall_timeout, args.max_retries,
            args.eval_batch, pending_evals, eval_epochs)

    eval_epochs(pending_evals(args.epochs), fatal=True)
    if worker is not None:
        worker.stop()
    print("campaign complete", flush=True)


if __name__ == "__main__":
    main()
