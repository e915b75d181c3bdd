"""Download and assemble the BurstSR dataset (cropped release).

Re-design of reference ``util_scripts/download_burstsr_dataset.py:22-72``:
fetches the 10 zip shards of the pre-cropped BurstSR release, verifies,
extracts and merges them into ``<out>/{train,val}``. Network access is
required; in zero-egress environments this script prints the manifest so
the shards can be staged out-of-band and assembled with ``--assemble_only``.
"""

import argparse
import os
import shutil
import zipfile

SHARDS = [f"burstsr_dataset_{i:02d}.zip" for i in range(10)]
RELEASE_URL = "https://data.vision.ee.ethz.ch/bhatg/"  # official host


def assemble(download_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for shard in SHARDS:
        path = os.path.join(download_dir, shard)
        if not os.path.exists(path):
            raise FileNotFoundError(f"missing shard {path}")
        print(f"extracting {shard}")
        with zipfile.ZipFile(path) as z:
            z.extractall(out_dir)
    # merge the per-shard train/val trees if extracted side-by-side
    for split in ("train", "val"):
        merged = os.path.join(out_dir, split)
        os.makedirs(merged, exist_ok=True)
        for entry in sorted(os.listdir(out_dir)):
            sub = os.path.join(out_dir, entry, split)
            if entry not in ("train", "val") and os.path.isdir(sub):
                for burst in os.listdir(sub):
                    shutil.move(os.path.join(sub, burst),
                                os.path.join(merged, burst))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--assemble_only", action="store_true",
                   help="skip downloading; just extract staged shards")
    args = p.parse_args()

    if not args.assemble_only:
        try:
            import urllib.request
            os.makedirs(args.download_dir, exist_ok=True)
            for shard in SHARDS:
                dst = os.path.join(args.download_dir, shard)
                if os.path.exists(dst):
                    continue
                url = RELEASE_URL + shard
                print(f"downloading {url}")
                urllib.request.urlretrieve(url, dst)
        except Exception as e:
            print(f"download failed ({e}). Stage these files into "
                  f"{args.download_dir} manually and re-run with "
                  f"--assemble_only:")
            for shard in SHARDS:
                print(f"  {RELEASE_URL}{shard}")
            return

    assemble(args.download_dir, args.out_dir)
    print(f"BurstSR assembled under {args.out_dir}")


if __name__ == "__main__":
    main()
