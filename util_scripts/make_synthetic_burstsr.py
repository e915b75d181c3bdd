"""Physically-consistent synthetic BurstSR dataset (real scales).

The real BurstSR dataset (Samsung S8 RAW bursts + Canon DSLR GT) cannot
be staged in this environment, so the realworld code path was covered
only by random-noise plumbing fixtures. This generator manufactures a
BurstSR-format dataset whose PHYSICS matches the real one's structure:

  * Samsung burst: a procedural HR scene pushed through the synthesis
    pipeline (``data/synthetic.py``: affine shifts, x2 downsample,
    Bayer mosaic, shot/read noise) -> 14 packed-RGGB uint16 frames with
    black level, WB and EXIF metadata in the reader's format;
  * Canon GT: the SAME scene under a KNOWN global translation, a KNOWN
    3x3 color transform, and a KNOWN exposure ratio (via EXIF
    exposure/iso/f-number) — exactly the misregistrations
    ``SpatialColorAlignment`` exists to undo;
  * the clean scene is stored alongside (``scene_linear.npy``) so tests
    can hand SCA a perfect prediction and MEASURE that the shipped
    aligner + color matcher recover the known transform
    (tests/test_synthetic_burstsr.py).

Directory layout matches ``data/burstsr.py``'s reader
(``<root>/val/<scene>_0001/samsung_00..13 + canon``), including the cv2
channel-order convention the real dataset's PNGs carry.

Usage:
    python util_scripts/make_synthetic_burstsr.py --out /tmp/fake_burstsr \
        [--bursts 2] [--lr 96] [--seed 0]
"""

import argparse
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMSUNG_BLACK = 64
SAMSUNG_MAX = 1023
CANON_BLACK = 512
CANON_MAX = 16383

# known Canon-vs-Samsung misregistration (what SCA must undo)
GT_SHIFT = (7.3, -5.1)  # (x, y) in GT px
COLOR_M = np.array([[0.90, 0.08, 0.02],
                    [0.05, 0.90, 0.05],
                    [0.02, 0.08, 0.90]], np.float32)
# EXIF: light ratio (exp*iso/f^2) samsung/canon = exp_scale_factor
SAMSUNG_EXIF = {"exposure": 0.01, "f_number": 1.7, "iso": 100.0,
                "noise_profile": [1e-3, 1e-5, 1e-3, 1e-5, 1e-3, 1e-5]}
CANON_EXIF = {"exposure": 0.04, "f_number": 4.0, "iso": 100.0}


def exp_scale_factor() -> float:
    light_s = SAMSUNG_EXIF["exposure"] * SAMSUNG_EXIF["iso"] / (
        SAMSUNG_EXIF["f_number"] ** 2)
    light_c = CANON_EXIF["exposure"] * CANON_EXIF["iso"] / (
        CANON_EXIF["f_number"] ** 2)
    return light_s / light_c


def _cv2_order(im: np.ndarray) -> np.ndarray:
    """Pre-swap so the reader's cv2 channel fix recovers our array."""
    im = im.copy()
    im[..., [0, 2]] = im[..., [2, 0]]
    return im


def _write_png16(path: str, arr: np.ndarray) -> None:
    from dbsr_tpu.utils.png16 import write_png
    write_png(path, _cv2_order(arr.astype(np.uint16)))


def generate_burst(key, lr: int, n_frames: int = 14):
    """(burst [N, lr, lr, 4] in [0,1], scene linear RGB [8lr, 8lr, 3]).

    Geometry matches real BurstSR: the Canon GT sits at 8x the packed
    Samsung frames (4x the flat RAW) — the same 4x-RAW-SR = 8x-packed
    factor the DBSR prediction upsamples by, so pred and GT share
    resolution in SCA."""
    import jax
    import jax.numpy as jnp

    from dbsr_tpu.data.procedural import dead_leaves_image
    from dbsr_tpu.data.synthetic import BurstConfig, rgb2rawburst

    cfg = BurstConfig(burst_size=n_frames, crop_sz=(8 * lr, 8 * lr),
                      downsample_factor=4, border_crop=16,
                      max_translation=12.0, max_rotation=0.3,
                      random_ccm=True, random_gains=True, smoothstep=True,
                      gamma=True, add_noise=True, fused_resample=True)
    k_img, k_burst = jax.random.split(key)
    hr = dead_leaves_image(k_img, cfg.pre_crop_sz)
    out = rgb2rawburst(k_burst, hr, cfg)
    return np.asarray(out["burst"]), np.asarray(out["frame_gt"])


def canon_from_scene(scene: np.ndarray) -> np.ndarray:
    """Known-misregistered Canon content: translate + color-transform the
    linear scene (values in [0,1], pre-exposure)."""
    import jax.numpy as jnp

    from dbsr_tpu.ops.interp import warp

    flow = jnp.broadcast_to(jnp.asarray(GT_SHIFT, jnp.float32),
                            scene.shape[:2] + (2,))
    shifted = np.asarray(warp(jnp.asarray(scene)[None], flow[None])[0])
    return np.clip(shifted @ COLOR_M.T, 0.0, 1.0)


def write_burst_dir(burst_dir: str, burst: np.ndarray,
                    scene: np.ndarray) -> None:
    canon_content = canon_from_scene(scene)
    es = exp_scale_factor()
    for i in range(burst.shape[0]):
        d = os.path.join(burst_dir, f"samsung_{i:02d}")
        os.makedirs(d, exist_ok=True)
        u16 = np.round(SAMSUNG_BLACK
                       + burst[i] * (SAMSUNG_MAX - SAMSUNG_BLACK))
        _write_png16(os.path.join(d, "im_raw.png"), u16)
        with open(os.path.join(d, "meta_info.pkl"), "wb") as f:
            pickle.dump({
                "black_level": [SAMSUNG_BLACK] * 4,
                "cam_wb": [1024.0, 1024.0, 1024.0, 1024.0],
                "daylight_wb": [1024.0, 1024.0, 1024.0, 1024.0],
                "color_matrix": np.eye(3, dtype=np.float32).ravel().tolist(),
                "exif_data": dict(SAMSUNG_EXIF),
                "im_preview": None,
            }, f)
    d = os.path.join(burst_dir, "canon")
    os.makedirs(d, exist_ok=True)
    # stored so that (stored - black)/NORM * exp_scale ~= canon_content
    u16 = np.round(CANON_BLACK
                   + canon_content / es * (CANON_MAX - CANON_BLACK))
    _write_png16(os.path.join(d, "im_raw.png"),
                 np.clip(u16, 0, CANON_MAX))
    with open(os.path.join(d, "meta_info.pkl"), "wb") as f:
        pickle.dump({
            "black_level": [CANON_BLACK] * 4,
            "cam_wb": [1024.0, 1024.0, 1024.0, 1024.0],
            "daylight_wb": [1024.0, 1024.0, 1024.0, 1024.0],
            "rgb_xyz_matrix": np.eye(3, dtype=np.float32).ravel().tolist(),
            "exif_data": dict(CANON_EXIF),
        }, f)
    np.save(os.path.join(burst_dir, "scene_linear.npy"), scene)


def generate_dataset(out_root: str, bursts: int = 2, lr: int = 96,
                     n_frames: int = 14, split: str = "val",
                     seed: int = 0) -> list:
    import jax

    from dbsr_tpu.data.burstsr import _load_split_ids

    ids = _load_split_ids(split)
    names = []
    for b in range(bursts):
        name = f"{ids[b]}_0001"
        burst_dir = os.path.join(out_root, split, name)
        key = jax.random.fold_in(jax.random.key(seed), b)
        burst, scene = generate_burst(key, lr, n_frames)
        write_burst_dir(burst_dir, burst, scene)
        names.append(name)
        print(f"wrote {burst_dir} (burst {burst.shape}, "
              f"scene {scene.shape})", flush=True)
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--bursts", type=int, default=2)
    ap.add_argument("--lr", type=int, default=96,
                    help="packed burst-frame size (GT is 8x)")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--split", default="val")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate_dataset(args.out, args.bursts, args.lr, args.frames,
                     args.split, args.seed)


if __name__ == "__main__":
    main()
