"""Render a campaign trajectory JSONL as the markdown table used in
README/STATUS/PERF.

The parity campaign driver (``util_scripts/parity_campaign.py``) appends
one ``{"epoch": E, "psnr": P, "ssim": S, "time": ...}`` line per scored
checkpoint to ``<workspace>/campaign_trajectory.jsonl``. This prints those
rows as a GitHub-markdown table so doc refreshes stay consistent (and
dedupes re-scored epochs, keeping the latest line per epoch — a restarted
campaign re-appends early epochs).

Usage:
    python util_scripts/trajectory_table.py /root/campaign/campaign_trajectory.jsonl
    python util_scripts/trajectory_table.py traj.jsonl --every 10 --last
"""

import argparse
import json


def load_rows(path):
    """Latest row per epoch, sorted by epoch."""
    by_epoch = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            by_epoch[int(row["epoch"])] = row
    return [by_epoch[e] for e in sorted(by_epoch)]


def format_table(rows, every=1, keep_last=False):
    """Markdown table string; ``every`` thins rows to epochs divisible by
    it (the final row is kept when ``keep_last``)."""
    shown = [r for r in rows if int(r["epoch"]) % every == 0]
    if keep_last and rows and (not shown or shown[-1] is not rows[-1]):
        shown.append(rows[-1])
    lines = ["| epoch | PSNR (dB) | SSIM |", "|---|---|---|"]
    for r in shown:
        lines.append(
            f"| {int(r['epoch'])} | {r['psnr']:.2f} | {r['ssim']:.4f} |")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("jsonl", help="campaign_trajectory.jsonl path")
    p.add_argument("--every", type=int, default=1,
                   help="only show epochs divisible by this")
    p.add_argument("--last", action="store_true",
                   help="always include the final scored epoch")
    args = p.parse_args(argv)
    rows = load_rows(args.jsonl)
    if not rows:
        print("(no trajectory rows yet)")
        return
    print(format_table(rows, every=args.every, keep_last=args.last))


if __name__ == "__main__":
    main()
