"""Download the full (uncropped) RAW BurstSR release.

Re-design of reference ``util_scripts/download_raw_burstsr_data.py:22-78``:
fetches the full-resolution RAW release (train/val zips), extracts, and
reports. Zero-egress mode prints the manifest for out-of-band staging.
"""

import argparse
import os
import zipfile

FILES = ["burstsr_full_train_raw.zip", "burstsr_full_val_raw.zip"]
RELEASE_URL = "https://data.vision.ee.ethz.ch/bhatg/"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--assemble_only", action="store_true")
    args = p.parse_args()

    if not args.assemble_only:
        try:
            import urllib.request
            os.makedirs(args.download_dir, exist_ok=True)
            for f in FILES:
                dst = os.path.join(args.download_dir, f)
                if not os.path.exists(dst):
                    print(f"downloading {RELEASE_URL}{f}")
                    urllib.request.urlretrieve(RELEASE_URL + f, dst)
        except Exception as e:
            print(f"download failed ({e}). Stage these files into "
                  f"{args.download_dir} and re-run with --assemble_only:")
            for f in FILES:
                print(f"  {RELEASE_URL}{f}")
            return

    os.makedirs(args.out_dir, exist_ok=True)
    for f in FILES:
        path = os.path.join(args.download_dir, f)
        print(f"extracting {f}")
        with zipfile.ZipFile(path) as z:
            z.extractall(args.out_dir)
    print(f"full RAW BurstSR under {args.out_dir}")


if __name__ == "__main__":
    main()
