"""BurstSR real-world dataset: Samsung S8 RAW bursts + Canon DSLR GT.

Re-design of reference ``dataset/burstsr_dataset.py`` +
``data/processing.py:126-277`` (``BurstSRProcessing``) in numpy
(host-side IO) with channels-last outputs ready for the device:

  * ``SamsungRAWImage``: 4-channel packed RGGB uint16 PNG + pickled meta
    (black_level, cam_wb, daylight_wb, color_matrix, EXIF); accessors for
    exposure/F-number/ISO and the EXIF 0xC761 noise profile; normalization
    by 1023.
  * ``CanonImage``: 3-channel GT (RGGB collapsed to RGB via channels
    [0, 1, 3]), normalization by 16383, display-processing path
    (``generate_processed_image``).
  * ``BurstSRDataset``: per-burst directories ``<split>/<name>/samsung_??``
    and ``canon``; split scene-id lists from ``dbsr_tpu/data_specs``.
  * ``BurstSRProcessing``: crop (burst + GT at scale factor),
    black-level/WB options, Bayer-preserving random flips
    (flatten -> flip -> shift-crop -> repack -> replicate-pad), exposure
    normalization of GT by (exposure*iso/f^2) ratio, optional synthetic
    noise.

EXIF note: the reference pickles store ``exifread`` objects, which need the
``exifread`` package to unpickle. ``_exif_scalar`` supports both that
format and plain dicts (``{"exposure":, "f_number":, "iso":,
"noise_profile":}``) so fixtures and re-exported datasets work without it.
"""

from __future__ import annotations

import os
import pickle
import random as pyrandom
from typing import List, Optional, Sequence, Tuple

import numpy as np

from dbsr_tpu.utils.native_io import read_png

_SPEC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data_specs")


def _load_split_ids(split: str) -> List[str]:
    path = os.path.join(_SPEC_DIR, f"burstsr_{split}.txt")
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def _exif_scalar(exif, plain_key: str, ref_key: str):
    """Read a scalar from plain-dict or exifread-style EXIF data."""
    if plain_key in exif:
        return float(exif[plain_key])
    v = exif[ref_key].values[0]
    return float(v.decimal()) if hasattr(v, "decimal") else float(v)


def _fix_cv2_channels(im: np.ndarray) -> np.ndarray:
    """Reference PNGs were written by cv2 (reversed channel order for the
    first/third channel); PIL-free read needs the swap to recover the
    writer's array (same convention as datasets.SyntheticBurstVal)."""
    if im.ndim == 3 and im.shape[-1] >= 3:
        im = im.copy()
        im[..., [0, 2]] = im[..., [2, 0]]
    return im


class SamsungRAWImage:
    """RAW burst frame from a Samsung Galaxy S8 (reference
    ``burstsr_dataset.py:35-111``). ``im_raw`` is ``[h, w, 4]`` int16
    packed RGGB."""

    NORM_FACTOR = 1023.0

    @classmethod
    def load(cls, path: str, cv2_channel_order: bool = True):
        im = read_png(os.path.join(path, "im_raw.png")).astype(np.int16)
        if cv2_channel_order:
            im = _fix_cv2_channels(im)
        with open(os.path.join(path, "meta_info.pkl"), "rb") as f:
            meta = pickle.load(f)
        return cls(im, meta["black_level"], meta["cam_wb"],
                   meta["daylight_wb"], meta["color_matrix"],
                   meta["exif_data"], meta.get("im_preview"))

    def __init__(self, im_raw, black_level, cam_wb, daylight_wb,
                 color_matrix, exif_data, im_preview=None):
        self.im_raw = im_raw
        self.black_level = black_level
        self.cam_wb = cam_wb
        self.daylight_wb = daylight_wb
        self.color_matrix = color_matrix
        self.exif_data = exif_data
        self.im_preview = im_preview
        self.norm_factor = self.NORM_FACTOR

    def get_all_meta_data(self) -> dict:
        cm = self.color_matrix
        return {"black_level": self.black_level, "cam_wb": self.cam_wb,
                "daylight_wb": self.daylight_wb,
                "color_matrix": cm.tolist() if hasattr(cm, "tolist") else cm}

    def get_exposure_time(self) -> float:
        return _exif_scalar(self.exif_data, "exposure",
                            "Image ExposureTime")

    def get_f_number(self) -> float:
        return _exif_scalar(self.exif_data, "f_number", "Image FNumber")

    def get_iso(self) -> float:
        return _exif_scalar(self.exif_data, "iso", "Image ISOSpeedRatings")

    def get_noise_profile(self) -> np.ndarray:
        """Shot/read noise calibration from EXIF tag 0xC761
        (reference ``burstsr_dataset.py:66-71``)."""
        if "noise_profile" in self.exif_data:
            return np.asarray(self.exif_data["noise_profile"],
                              np.float64).reshape(3, 2)
        noise = self.exif_data["Image Tag 0xC761"].values
        noise = [n[0] for n in noise]
        return np.array(noise, np.float64).reshape(3, 2)

    def get_image_data(self, substract_black_level=False, white_balance=False,
                       normalize=False) -> np.ndarray:
        im = self.im_raw.astype(np.float32)
        if substract_black_level:
            im = im - np.asarray(self.black_level, np.float32).reshape(
                1, 1, 4)
        if white_balance:
            im = im * np.asarray(self.cam_wb, np.float32).reshape(1, 1, 4)
        if normalize:
            im = im / self.norm_factor
        return im

    def shape(self) -> Tuple[int, int, int]:
        return self.im_raw.shape

    def get_crop(self, r1, r2, c1, c2) -> "SamsungRAWImage":
        prev = (self.im_preview[2 * r1:2 * r2, 2 * c1:2 * c2]
                if self.im_preview is not None else None)
        return SamsungRAWImage(self.im_raw[r1:r2, c1:c2], self.black_level,
                               self.cam_wb, self.daylight_wb,
                               self.color_matrix, self.exif_data, prev)


class CanonImage:
    """DSLR ground-truth frame (reference ``burstsr_dataset.py:114-230``).
    ``im_raw`` is ``[H, W, 3]`` float (RGGB channels collapsed via
    [0, 1, 3])."""

    NORM_FACTOR = 16383.0

    @classmethod
    def load(cls, path: str, cv2_channel_order: bool = True):
        im = read_png(os.path.join(path, "im_raw.png")).astype(np.int16)
        if cv2_channel_order:
            im = _fix_cv2_channels(im)
        with open(os.path.join(path, "meta_info.pkl"), "rb") as f:
            meta = pickle.load(f)
        return cls(im.astype(np.float32), meta["black_level"],
                   meta["cam_wb"], meta["daylight_wb"],
                   meta["rgb_xyz_matrix"], meta["exif_data"])

    def __init__(self, im_raw, black_level, cam_wb, daylight_wb,
                 rgb_xyz_matrix, exif_data):
        self.im_raw = im_raw
        self.black_level = (list(black_level[:2]) + [black_level[3]]
                            if len(black_level) == 4 else list(black_level))
        self.cam_wb = (list(cam_wb[:2]) + [cam_wb[3]]
                       if len(cam_wb) == 4 else list(cam_wb))
        self.daylight_wb = (list(daylight_wb[:2]) + [daylight_wb[3]]
                            if len(daylight_wb) == 4 else list(daylight_wb))
        self.rgb_xyz_matrix = rgb_xyz_matrix
        self.exif_data = exif_data
        self.norm_factor = self.NORM_FACTOR

    @staticmethod
    def generate_processed_image(im: np.ndarray, meta_data: dict,
                                 external_norm_factor: Optional[float] = None,
                                 gamma: bool = True, smoothstep: bool = True,
                                 no_white_balance: bool = False,
                                 return_np: bool = False) -> np.ndarray:
        """Display path: normalize, black-level subtract, WB, gamma,
        smoothstep (reference ``burstsr_dataset.py:127-156``). ``im`` is
        channels-last [H, W, 3]."""
        im = im * meta_data.get("norm_factor", 1.0)
        if not meta_data.get("black_level_subtracted", False):
            bl = np.asarray(meta_data["black_level"], np.float32)
            bl = bl[[0, 1, -1]] if bl.size == 4 else bl
            im = im - bl.reshape(1, 1, 3)
        if not meta_data.get("while_balance_applied", False) and \
                not no_white_balance:
            wb = np.asarray(meta_data["cam_wb"], np.float32)
            wb = wb[[0, 1, -1]] if wb.size == 4 else wb
            im = im * wb.reshape(1, 1, 3) / wb[1]
        if external_norm_factor is None:
            im = im / (im.mean() * 5.0)
        else:
            im = im / external_norm_factor
        im = np.clip(im, 0.0, 1.0)
        if gamma:
            im = im ** (1.0 / 2.2)
        if smoothstep:
            im = 3 * im**2 - 2 * im**3
        if return_np:
            im = (im * 255.0).astype(np.uint8)
        return im

    def get_all_meta_data(self) -> dict:
        m = self.rgb_xyz_matrix
        return {"black_level": self.black_level, "cam_wb": self.cam_wb,
                "daylight_wb": self.daylight_wb,
                "rgb_xyz_matrix": m.tolist() if hasattr(m, "tolist") else m,
                "norm_factor": self.norm_factor}

    def get_exposure_time(self) -> float:
        return _exif_scalar(self.exif_data, "exposure", "EXIF ExposureTime")

    def get_f_number(self) -> float:
        return _exif_scalar(self.exif_data, "f_number", "EXIF FNumber")

    def get_iso(self) -> float:
        return _exif_scalar(self.exif_data, "iso", "EXIF ISOSpeedRatings")

    def get_image_data(self, substract_black_level=False, white_balance=False,
                       normalize=False) -> np.ndarray:
        im = self.im_raw.astype(np.float32)
        if substract_black_level:
            im = im - np.asarray(self.black_level, np.float32).reshape(
                1, 1, 3)
        if white_balance:
            im = im * np.asarray(self.cam_wb, np.float32).reshape(
                1, 1, 3) / 1024.0
        if normalize:
            im = im / self.norm_factor
        return im

    def shape(self) -> Tuple[int, int, int]:
        return self.im_raw.shape

    def get_crop(self, r1, r2, c1, c2) -> "CanonImage":
        return CanonImage(self.im_raw[r1:r2, c1:c2], self.black_level,
                          self.cam_wb, self.daylight_wb,
                          self.rgb_xyz_matrix, self.exif_data)


class BurstSRDataset:
    """Burst directory dataset (reference ``burstsr_dataset.py:233-302``):
    ``<root>/<split>/<burst_name>/samsung_{00..13}`` + ``canon``; burst
    size fixed at 14; split scene ids from ``dbsr_tpu/data_specs``."""

    def __init__(self, root: str, split: str = "train",
                 seq_ids: Optional[Sequence[str]] = None):
        self.root = root
        self.split = split
        self.burst_list = self._get_burst_list(split, seq_ids)
        self.burst_size = 14

    def _get_burst_list(self, split, seq_ids):
        listing = sorted(os.listdir(os.path.join(self.root, self.split)))
        if split is None and seq_ids is not None:
            return [b for b in listing if b[:4] in set(seq_ids)]
        ids = set(_load_split_ids(split))
        return [b for b in listing if b[:4] in ids]

    def get_name(self):
        return "BurstSRDataset"

    def get_num_bursts(self) -> int:
        return len(self.burst_list)

    def __len__(self):
        return self.get_num_bursts()

    def get_burst_info(self, burst_id: int) -> dict:
        """Burst metadata. The reference hardcodes burst_size=14
        (``burstsr_dataset.py:272``); we report the actual number of
        ``samsung_*`` frame dirs present (14 for the real dataset) so
        partial fixtures behave."""
        d = os.path.join(self.root, self.split, self.burst_list[burst_id])
        n = len([f for f in os.listdir(d) if f.startswith("samsung_")])
        return {"burst_size": n or 14,
                "burst_name": self.burst_list[burst_id]}

    def _get_raw_image(self, burst_id: int, im_id: int) -> SamsungRAWImage:
        return SamsungRAWImage.load(os.path.join(
            self.root, self.split, self.burst_list[burst_id],
            f"samsung_{im_id:02d}"))

    def _get_gt_image(self, burst_id: int) -> CanonImage:
        return CanonImage.load(os.path.join(
            self.root, self.split, self.burst_list[burst_id], "canon"))

    def get_burst(self, burst_id: int, im_ids: Sequence[int],
                  info: Optional[dict] = None):
        frames = [self._get_raw_image(burst_id, i) for i in im_ids]
        gt = self._get_gt_image(burst_id)
        return frames, gt, info or self.get_burst_info(burst_id)


class BurstSRProcessing:
    """Per-sample processing (reference ``data/processing.py:126-277``).

    ``__call__(frames, gt, rng)`` returns a dict with ``burst``
    ``[N, crop, crop, 4]`` float32, ``frame_gt``
    ``[N*scale... , 3]`` exposure-normalized float32, plus meta dicts and
    the exposure scale factor.
    """

    def __init__(self, crop_sz: int = 64, substract_black_level=False,
                 white_balance=False, random_flip=False, noise_level=None,
                 random_crop=True):
        self.crop_sz = crop_sz
        self.substract_black_level = substract_black_level
        self.white_balance = white_balance
        self.random_flip = random_flip
        self.noise_level = noise_level
        self.random_crop = random_crop

    def __call__(self, frames: List[SamsungRAWImage], gt: CanonImage,
                 rng: Optional[np.random.Generator] = None) -> dict:
        rng = rng or np.random.default_rng()
        from dbsr_tpu.ops.raw import flatten_raw_image, pack_raw_image
        import jax.numpy as jnp

        if frames[0].shape()[1] != self.crop_sz:
            H, W = frames[0].shape()[:2]
            if self.random_crop:
                r1 = int(rng.integers(0, H - self.crop_sz + 1))
                c1 = int(rng.integers(0, W - self.crop_sz + 1))
            else:
                r1 = (H - self.crop_sz) // 2
                c1 = (W - self.crop_sz) // 2
            r2, c2 = r1 + self.crop_sz, c1 + self.crop_sz
            scale = gt.shape()[1] // W
            frames = [f.get_crop(r1, r2, c1, c2) for f in frames]
            gt = gt.get_crop(scale * r1, scale * r2, scale * c1, scale * c2)

        burst = np.stack([
            f.get_image_data(normalize=True,
                             substract_black_level=self.substract_black_level,
                             white_balance=self.white_balance)
            for f in frames])
        gt_im = gt.get_image_data(
            normalize=True, substract_black_level=self.substract_black_level,
            white_balance=self.white_balance)

        if self.random_flip:
            flat = np.asarray(flatten_raw_image(jnp.asarray(burst)))
            pad = [0, 0]  # (left/right, top/bottom) replicate pad after crop
            if rng.random() > 0.5:
                flat = flat[..., :, ::-1][..., :, 1:-1]
                gt_im = gt_im[:, ::-1][:, 2:-2]
                pad[0] = 1
            if rng.random() > 0.5:
                flat = flat[..., ::-1, :][..., 1:-1, :]
                gt_im = gt_im[::-1, :][2:-2, :]
                pad[1] = 1
            burst = np.asarray(pack_raw_image(jnp.asarray(
                np.ascontiguousarray(flat))))
            if pad[0] or pad[1]:
                burst = np.pad(
                    burst, ((0, 0), (0, pad[1]), (0, pad[0]), (0, 0)),
                    mode="edge")
                gt_im = np.pad(
                    gt_im, ((0, 4 * pad[1]), (0, 4 * pad[0]), (0, 0)),
                    mode="edge")
            gt_im = np.ascontiguousarray(gt_im)

        burst_meta = frames[0].get_all_meta_data()
        burst_meta["black_level_subtracted"] = self.substract_black_level
        burst_meta["while_balance_applied"] = self.white_balance
        burst_meta["norm_factor"] = frames[0].norm_factor
        gt_meta = gt.get_all_meta_data()

        if self.noise_level is not None:
            log_shot = rng.uniform(np.log(self.noise_level[0]),
                                   np.log(self.noise_level[1]))
            shot = np.exp(log_shot)
            read = np.exp(2.18 * log_shot + 1.20 + rng.normal(0, 0.26))
            var = burst * shot + read
            burst = np.clip(
                burst + rng.normal(size=burst.shape) * np.sqrt(var),
                0.0, 1.0).astype(np.float32)

        light_burst = frames[0].get_exposure_time() * frames[0].get_iso() / (
            frames[0].get_f_number() ** 2)
        light_canon = gt.get_exposure_time() * gt.get_iso() / (
            gt.get_f_number() ** 2)
        exp_scale = light_burst / light_canon
        gt_im = gt_im * exp_scale

        gt_meta["black_level_subtracted"] = self.substract_black_level
        gt_meta["while_balance_applied"] = self.white_balance
        gt_meta["norm_factor"] = gt.norm_factor / exp_scale
        for meta, src in ((burst_meta, frames[0]), (gt_meta, gt)):
            meta["exposure"] = src.get_exposure_time()
            meta["f_number"] = src.get_f_number()
            meta["iso"] = src.get_iso()
        burst_meta["noise_profile"] = frames[0].get_noise_profile()[0, :]

        return {"burst": burst.astype(np.float32),
                "frame_gt": gt_im.astype(np.float32),
                "meta_info_burst": burst_meta, "meta_info_gt": gt_meta,
                "exp_scale_factor": exp_scale}


class IndexedBurstSampler:
    """Sequential burst access with frame-id selection (reference
    ``IndexedBurst``, ``data/sampler.py:120-168``): frame 0 is always the
    reference; remaining ids drawn without replacement (padded by
    repetition when the burst is short)."""

    def __init__(self, dataset: BurstSRDataset, burst_size: int = 14,
                 processing: Optional[BurstSRProcessing] = None,
                 random_reference_image: bool = False, seed: int = 0):
        self.dataset = dataset
        self.burst_size = burst_size
        self.processing = processing or BurstSRProcessing()
        self.random_reference_image = random_reference_image
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.dataset)

    def _select_ids(self, available: int) -> List[int]:
        n = min(self.burst_size, available)
        if self.random_reference_image:
            ids = list(self.rng.choice(available, n, replace=False))
        else:
            ids = [0] + list(1 + self.rng.choice(available - 1, n - 1,
                                                 replace=False))
        while len(ids) < self.burst_size:
            ids = ids + ids[:self.burst_size - len(ids)]
        return [int(i) for i in ids]

    def __getitem__(self, index: int) -> dict:
        info = self.dataset.get_burst_info(index)
        ids = self._select_ids(info["burst_size"])
        frames, gt, info = self.dataset.get_burst(index, ids, info)
        out = self.processing(frames, gt, self.rng)
        out["burst_name"] = info["burst_name"]
        return out


class RandomBurstSampler(IndexedBurstSampler):
    """Random burst draws for training (reference ``RandomBurst``,
    ``data/sampler.py:171-228``)."""

    def __init__(self, dataset, burst_size=8, samples_per_epoch=1000,
                 processing=None, random_reference_image=False, seed=0):
        super().__init__(dataset, burst_size, processing,
                         random_reference_image, seed)
        self.samples_per_epoch = samples_per_epoch

    def __len__(self):
        return self.samples_per_epoch

    def __getitem__(self, index: int) -> dict:
        idx = int(self.rng.integers(0, len(self.dataset)))
        return super().__getitem__(idx)


def get_burstsr_val_set(root: str):
    """Validation configuration (reference ``burstsr_dataset.py:294-302``):
    val split, center crop 80, burst 14, black level subtracted."""
    ds = BurstSRDataset(root, split="val")
    proc = BurstSRProcessing(crop_sz=80, substract_black_level=True,
                             random_flip=False, random_crop=False)
    return IndexedBurstSampler(ds, burst_size=14, processing=proc)


class BaseRawBurstDataset:
    """Burst-dataset contract (reference
    ``dataset/base_rawburst_dataset.py:18-85``): implement ``get_burst``
    and ``get_burst_info``. ``BurstSRDataset`` satisfies it; synthetic
    sources can subclass to plug into the burst samplers."""

    def __init__(self, name: str, root: str):
        self.name = name
        self.root = root

    def get_name(self) -> str:
        return self.name

    def get_num_bursts(self) -> int:
        raise NotImplementedError

    def __len__(self):
        return self.get_num_bursts()

    def get_burst_info(self, burst_id: int) -> dict:
        raise NotImplementedError

    def get_burst(self, burst_id: int, im_ids, info=None):
        raise NotImplementedError
