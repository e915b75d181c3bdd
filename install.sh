#!/usr/bin/env bash
# Setup for dbsr_tpu (re-design of the reference's conda-based install.sh:
# no conda/CUDA/CuPy — jax/flax/optax are the only Python deps, and the
# native IO runtime builds with g++ + zlib).
set -e
cd "$(dirname "$0")"

echo "*** building native IO runtime (libdbsr_io.so) ***"
make -C native

echo "*** creating machine-local environment file ***"
python - <<'PY'
from dbsr_tpu.environment import env_settings, _env_file
env = env_settings()
print(f"environment file: {_env_file()}")
print("edit it to point at your datasets:")
for k in ("zurichraw2rgb_dir", "burstsr_dir", "synburstval_dir",
          "pretrained_nets_dir", "workspace_dir"):
    print(f"  {k}: {getattr(env, k)!r}")
PY

echo "*** aligner ***"
echo "  The shipped aligner (AlignLite) pretrains from scratch in ~30 min"
echo "  of chip time — no downloads:"
echo "      python run_training.py align_lite pretrain_synthetic"
echo "  (a pretrained artifact also ships in dbsr_tpu/artifacts/)"

echo "*** optional pretrained weights (for eval-parity experiments) ***"
echo "  - PWC-Net: convert a pwcnet-network-default.pth with"
echo "      python -c 'from dbsr_tpu.utils.convert_pwcnet import *; ...'"
echo "  - LPIPS:   python -c 'from dbsr_tpu.models.lpips import"
echo "      convert_from_torch; convert_from_torch(\"lpips_alex.npz\")'"
echo "    (requires the lpips pip package in the converting environment)"

echo "*** smoke test ***"
python run_training.py dbsr smoke_tiny
echo "install OK"
