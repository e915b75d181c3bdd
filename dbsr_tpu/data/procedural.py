"""Procedural source imagery: on-device dead-leaves natural-image model.

The reference trains on Zurich-RAW-to-RGB 448^2 sRGB crops
(``/root/reference/dataset/zurich_raw2rgb_dataset.py``). In zero-egress
environments no natural-image corpus can be staged, so this module
synthesizes source imagery ON DEVICE with a dead-leaves occlusion model —
the standard natural-image prior for training restoration networks without
data: power-law object sizes reproduce the scale-invariant (1/f) spectra
and occlusion-edge statistics of photographs (Lee/Mumford/Huang's dead
leaves; Achddou et al. showed restoration nets trained purely on such
imagery come within ~1 dB of natural-data training).

Everything is jit/vmap-friendly (static shapes, ``lax.fori_loop``,
elementwise coordinate math only — TPU MXU DEFAULT precision truncates f32
matmul operands to bf16, so no einsums on coordinates). A generated pool
stays resident in HBM; training steps draw random crops from it with
``jnp.take`` — zero host->device feed (which some remote runtimes retain
for the process lifetime) and zero host CPU cost.

Beyond dead leaves, a MIXED corpus (``mix='mixed'``) blends four more
generators covering structure the occlusion model lacks — hard
text/edge primitives, near-Nyquist oriented gratings (the aliasing band
multi-frame SR must recover), full-band stochastic texture, and smooth
gradient fields — in the ``MIXED_RECIPE`` proportions, assigned per
generation chunk so pool refresh cost is unchanged.

Dead-leaves image model per sample:
  1. 4-color random palette + background;
  2. ``num_leaves`` anti-aliased ellipses, centers uniform, radii from the
     r^-3 dead-leaves law, palette colors with jitter and a linear shading
     gradient across each leaf (painter's composition);
  3. multi-octave filtered-noise texture overlay;
  4. random global illumination gradient;
  5. random Gaussian blur (sigma ~ U[0.2, 1.1]) standing in for camera
     PSF/defocus so HR edges are not unnaturally step-sharp;
  6. clip to [0, 1].
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def octave_noise(key: jax.Array, hw: Tuple[int, int],
                 bases=(7, 14, 28, 56, 112), decay: float = 0.55,
                 channels: int = 3) -> jax.Array:
    """Multi-octave bilinear-upsampled uniform noise in [0, 1], [H, W, C]."""
    from dbsr_tpu.ops.interp import resize_bilinear

    H, W = hw
    img = jnp.zeros((H, W, channels), jnp.float32)
    amp, total = 1.0, 0.0
    for octave, base in enumerate(bases):
        k = jax.random.fold_in(key, octave)
        coarse = jax.random.uniform(k, (base, base, channels), jnp.float32)
        img = img + amp * resize_bilinear(coarse, (H, W))
        total += amp
        amp *= decay
    return img / total


def _gaussian_blur_random(key: jax.Array, img: jax.Array,
                          sigma_range: Tuple[float, float]) -> jax.Array:
    """Separable 5-tap Gaussian blur with a random (traced) sigma."""
    sigma = jax.random.uniform(key, (), jnp.float32, *sigma_range)
    x = jnp.arange(-2, 3, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    C = img.shape[-1]
    kh = jnp.broadcast_to(g[:, None, None, None], (5, 1, 1, C))
    kw = jnp.broadcast_to(g[None, :, None, None], (1, 5, 1, C))
    y = img[None]
    for kern in (kh, kw):
        y = jax.lax.conv_general_dilated(
            y, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C, precision=jax.lax.Precision.HIGHEST)
    return y[0]


def dead_leaves_image(key: jax.Array, hw: Tuple[int, int],
                      num_leaves: int = 300, rmin: float = 4.0,
                      rmax_frac: float = 0.45, palette_size: int = 4,
                      color_jitter: float = 0.12, grad_amp: float = 0.35,
                      texture_amp: float = 0.10,
                      illum_amp: float = 0.15,
                      sigma_range: Tuple[float, float] = (0.2, 1.1),
                      ) -> jax.Array:
    """One procedural source image, [H, W, 3] float32 in [0, 1]."""
    H, W = hw
    k_pal, k_bg, k_leaves, k_tex, k_illum, k_blur = jax.random.split(key, 6)

    palette = jax.random.uniform(k_pal, (palette_size, 3), jnp.float32,
                                 0.05, 0.95)
    bg = palette[0] + color_jitter * jax.random.normal(k_bg, (3,))
    img = jnp.broadcast_to(jnp.clip(bg, 0.0, 1.0), (H, W, 3)).astype(
        jnp.float32)

    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    rmax = rmax_frac * min(H, W)
    # inverse-CDF of the r^-3 dead-leaves radius law on [rmin, rmax]
    ratio2 = (rmin / rmax) ** 2

    def body(i, img):
        k = jax.random.fold_in(k_leaves, i)
        u = jax.random.uniform(k, (8,), jnp.float32)
        kc, kg = jax.random.split(jax.random.fold_in(k, 1))

        r = rmin * jax.lax.rsqrt(1.0 - u[0] * (1.0 - ratio2))
        cx = u[1] * (W - 1)
        cy = u[2] * (H - 1)
        theta = u[3] * (2.0 * math.pi)
        # log-uniform ellipse aspect in [2/3, 3/2]
        a = jnp.exp((u[4] - 0.5) * 0.81)
        pj = (u[5] * palette_size).astype(jnp.int32)
        color = jnp.clip(
            palette[pj] + color_jitter * jax.random.normal(kc, (3,)),
            0.0, 1.0)
        gx, gy = jax.random.normal(kg, (2,))

        ct, st = jnp.cos(theta), jnp.sin(theta)
        dx = xs - cx
        dy = ys - cy
        xr = (ct * dx + st * dy) * a
        yr = (-st * dx + ct * dy) / a
        d = jnp.sqrt(xr * xr + yr * yr + 1e-8)
        cover = jnp.clip(0.5 + (r - d), 0.0, 1.0)  # 1 px anti-alias ramp
        shade = 1.0 + grad_amp * (gx * xr + gy * yr) / r
        col = color[None, None, :] * shade[..., None]
        return img * (1.0 - cover[..., None]) + col * cover[..., None]

    img = jax.lax.fori_loop(0, num_leaves, body, img)

    img = img + texture_amp * (octave_noise(k_tex, hw) - 0.5)

    # smooth global illumination gradient (random direction)
    ki1, ki2 = jax.random.split(k_illum)
    gdir = jax.random.normal(ki1, (2,))
    gdir = gdir / jnp.sqrt((gdir * gdir).sum() + 1e-8)
    amp = illum_amp * jax.random.uniform(ki2, ())
    ramp = (gdir[0] * (xs / W - 0.5) + gdir[1] * (ys / H - 0.5))
    img = img * (1.0 + amp * ramp[..., None])

    img = _gaussian_blur_random(k_blur, img, sigma_range)
    return jnp.clip(img, 0.0, 1.0)


def hard_edges_image(key: jax.Array, hw: Tuple[int, int],
                     num_shapes: int = 120,
                     sigma_range: Tuple[float, float] = (0.15, 0.7),
                     ) -> jax.Array:
    """High-contrast rotated rectangles, bars and thin strokes — text/edge
    primitives. Same painter's composition as dead leaves but with extreme
    aspect ratios and a full-contrast palette: step edges at every
    orientation are exactly the structure 4x SR must hallucinate least."""
    H, W = hw
    k_bg, k_shapes, k_blur = jax.random.split(key, 3)
    bg = jax.random.uniform(k_bg, (3,), jnp.float32, 0.0, 1.0)
    img = jnp.broadcast_to(bg, (H, W, 3)).astype(jnp.float32)

    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def body(i, img):
        k = jax.random.fold_in(k_shapes, i)
        u = jax.random.uniform(k, (9,), jnp.float32)
        cx = u[0] * (W - 1)
        cy = u[1] * (H - 1)
        theta = u[2] * math.pi
        # log-uniform half-extents: strokes (1 px) up to bars (W/6)
        hx = jnp.exp(jnp.log(1.0) + u[3] * (jnp.log(W / 6.0)))
        hy = jnp.exp(jnp.log(0.7) + u[4] * (jnp.log(H / 24.0)))
        color = jax.random.uniform(jax.random.fold_in(k, 1), (3,),
                                   jnp.float32, 0.0, 1.0)
        # bias toward full contrast: push channels to the rails half the time
        rail = (color > 0.5).astype(jnp.float32)
        color = jnp.where(u[5] < 0.5, rail, color)

        ct, st = jnp.cos(theta), jnp.sin(theta)
        dx = xs - cx
        dy = ys - cy
        xr = ct * dx + st * dy
        yr = -st * dx + ct * dy
        cover = (jnp.clip(0.5 + (hx - jnp.abs(xr)), 0.0, 1.0)
                 * jnp.clip(0.5 + (hy - jnp.abs(yr)), 0.0, 1.0))
        return img * (1.0 - cover[..., None]) + color * cover[..., None]

    img = jax.lax.fori_loop(0, num_shapes, body, img)
    img = _gaussian_blur_random(k_blur, img, sigma_range)
    return jnp.clip(img, 0.0, 1.0)


def gratings_image(key: jax.Array, hw: Tuple[int, int],
                   num_components: int = 3,
                   sigma_range: Tuple[float, float] = (0.15, 0.5),
                   ) -> jax.Array:
    """Oriented sinusoidal gratings with log-uniform frequencies up to
    near-Nyquist — the structure that aliases through the x4 downsample +
    Bayer mosaic, i.e. exactly what multi-frame SR exists to recover."""
    H, W = hw
    k_comp, k_dc, k_blur = jax.random.split(key, 3)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    dc = jax.random.uniform(k_dc, (3,), jnp.float32, 0.25, 0.75)
    img = jnp.broadcast_to(dc, (H, W, 3)).astype(jnp.float32)
    for i in range(num_components):
        k = jax.random.fold_in(k_comp, i)
        u = jax.random.uniform(k, (6,), jnp.float32)
        theta = u[0] * math.pi
        # cycles/px, log-uniform in [1/64, 0.45] (0.5 = Nyquist)
        freq = jnp.exp(jnp.log(1.0 / 64.0)
                       + u[1] * (jnp.log(0.45) - jnp.log(1.0 / 64.0)))
        phase = u[2] * (2.0 * math.pi)
        amp = 0.08 + 0.22 * u[3]
        color = jax.random.uniform(jax.random.fold_in(k, 1), (3,),
                                   jnp.float32, -1.0, 1.0)
        wave = jnp.sin(2.0 * math.pi * freq
                       * (jnp.cos(theta) * xs + jnp.sin(theta) * ys)
                       + phase)
        # smooth spatial envelope so gratings are local, not global
        ex = u[4] * (W - 1)
        ey = u[5] * (H - 1)
        env = jnp.exp(-(((xs - ex) / (0.45 * W)) ** 2
                        + ((ys - ey) / (0.45 * H)) ** 2))
        img = img + amp * (wave * env)[..., None] * color
    img = _gaussian_blur_random(k_blur, img, sigma_range)
    return jnp.clip(img, 0.0, 1.0)


def smooth_gradients_image(key: jax.Array, hw: Tuple[int, int],
                           ) -> jax.Array:
    """Very low-frequency content (coarse octave noise + illumination
    ramp): denoising/low-light fidelity material with no edges to hide
    behind."""
    H, W = hw
    k_noise, k_illum, k_gamma = jax.random.split(key, 3)
    img = octave_noise(k_noise, hw, bases=(2, 3, 5), decay=0.7)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    gdir = jax.random.normal(k_illum, (2,))
    gdir = gdir / jnp.sqrt((gdir * gdir).sum() + 1e-8)
    ramp = gdir[0] * (xs / W - 0.5) + gdir[1] * (ys / H - 0.5)
    img = img * (1.0 + 0.4 * ramp[..., None])
    # random per-channel gamma varies the tonal distribution
    g = jnp.exp(jax.random.uniform(k_gamma, (3,), jnp.float32, -0.5, 0.5))
    return jnp.clip(jnp.clip(img, 0.0, 1.0) ** g, 0.0, 1.0)


def noise_texture_image(key: jax.Array, hw: Tuple[int, int],
                        sigma_range: Tuple[float, float] = (0.2, 0.9),
                        ) -> jax.Array:
    """Full-band multi-octave texture with random contrast — stochastic
    micro-texture (foliage/fabric/gravel statistics)."""
    k_noise, k_con, k_blur = jax.random.split(key, 3)
    img = octave_noise(k_noise, hw, bases=(7, 14, 28, 56, 112, 224),
                       decay=0.65)
    c = jax.random.uniform(k_con, (), jnp.float32, 0.6, 1.6)
    img = 0.5 + (img - 0.5) * c
    img = _gaussian_blur_random(k_blur, img, sigma_range)
    return jnp.clip(img, 0.0, 1.0)


# Mixed-corpus recipe: generator -> share of the pool. Dead leaves stays
# the backbone (occlusion + scale-invariance); the rest add the structure
# it lacks (straight step edges, aliasing-band gratings, smooth fields,
# full-band texture). See PERF.md "procedural source A/B" for the
# measured effect vs dead-leaves-only.
MIXED_RECIPE = (
    ("dead_leaves", 0.45),
    ("edges", 0.20),
    ("gratings", 0.15),
    ("noise", 0.10),
    ("gradients", 0.10),
)

GENERATORS = {
    "dead_leaves": dead_leaves_image,
    "edges": hard_edges_image,
    "gratings": gratings_image,
    "noise": noise_texture_image,
    "gradients": smooth_gradients_image,
}


def _mix_plan(n_chunks: int, seed: int, recipe=MIXED_RECIPE):
    """Deterministic per-chunk generator assignment matching the recipe
    proportions (shuffled so pool position carries no type information)."""
    names = []
    for name, frac in recipe:
        names += [name] * max(1, round(frac * n_chunks))
    names = names[:n_chunks]
    while len(names) < n_chunks:
        names.append(recipe[0][0])
    rng = np.random.RandomState(seed ^ 0x5EED)
    rng.shuffle(names)
    return names


class ProceduralImagePool:
    """HBM-resident pool of procedural source crops, refreshed on device.

    The pool array is passed through the jitted train step as a REAL
    argument (see ``make_pool_prepare_fn``), so ``refresh()`` never
    triggers recompilation and no bytes cross the host boundary.
    """

    def __init__(self, pool_size: int, hw: Tuple[int, int], seed: int = 0,
                 chunk: int = 32, mix: str = "deadleaves", **gen_kwargs):
        self.pool_size = pool_size
        self.hw = tuple(hw)
        self.seed = seed
        self.chunk = chunk
        self.mix = mix
        self._round = None
        self.pool: Optional[jax.Array] = None
        self._chunk_fns = {}

        def make_chunk_fn(gen_name):
            gen = GENERATORS[gen_name]
            kw = gen_kwargs if gen_name == "dead_leaves" else {}

            def make_u8(key):
                img = gen(key, self.hw, **kw)
                return (img * 255.0 + 0.5).astype(jnp.uint8)

            return jax.jit(jax.vmap(make_u8))

        self._make_chunk_fn = make_chunk_fn

    def _chunk_fn(self, gen_name: str):
        if gen_name not in self._chunk_fns:
            self._chunk_fns[gen_name] = self._make_chunk_fn(gen_name)
        return self._chunk_fns[gen_name]

    def fold_in_process(self, process_index: int) -> None:
        """Decorrelate pools across multi-host processes (same contract as
        ``CropBatcher.fold_in_process``)."""
        self.seed = self.seed * 1000003 + 7919 * (process_index + 1)
        self._round = None

    def refresh(self, round_idx: int) -> jax.Array:
        """(Re)generate the pool for ``round_idx`` (e.g. the epoch index);
        idempotent per round. Chunked to bound peak generation memory."""
        if self._round == round_idx and self.pool is not None:
            return self.pool
        base = jax.random.fold_in(jax.random.key(self.seed), round_idx)
        starts = list(range(0, self.pool_size, self.chunk))
        if self.mix == "mixed":
            plan = _mix_plan(len(starts), self.seed + round_idx)
        else:
            plan = ["dead_leaves"] * len(starts)
        chunks = []
        for lo, gen_name in zip(starts, plan):
            n = min(self.chunk, self.pool_size - lo)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                jnp.arange(lo, lo + n))
            chunks.append(self._chunk_fn(gen_name)(keys))
        self.pool = chunks[0] if len(chunks) == 1 else jnp.concatenate(
            chunks, axis=0)
        self._round = round_idx
        return self.pool


class ProceduralPoolBatcher:
    """LoaderSpec-compatible batcher backed by a ``ProceduralImagePool``.

    ``next_batch()`` returns the current on-device pool handle (refreshed
    every ``num_batches`` calls, i.e. once per epoch); the per-step crop
    draw + synthesis happens inside the jitted step via
    ``make_pool_prepare_fn``. Construct the Trainer with
    ``cast_uint8_inputs=False`` so the uint8 pool is not up-cast wholesale.
    """

    def __init__(self, pool: ProceduralImagePool, batch_size: int,
                 num_batches: int):
        self.pool = pool
        self.batch_size = batch_size
        self.num_batches = num_batches
        self._calls = 0

    def __len__(self):
        return self.num_batches

    def fold_in_process(self, process_index: int) -> None:
        self.pool.fold_in_process(process_index)

    def next_batch(self):
        epoch_round = self._calls // self.num_batches
        self._calls += 1
        return self.pool.refresh(epoch_round)


def make_pool_prepare_fn(cfg, batch_size: int, random_flip: bool = True,
                         synthesize=None):
    """Build a Trainer ``prepare_fn(key, pool) -> batch``: draw
    ``batch_size`` random pool crops on device (uint8 -> f32/255), random
    horizontal flip, then burst synthesis (``synthesize_batch`` with
    ``cfg`` by default)."""
    from dbsr_tpu.data.synthetic import synthesize_batch

    synth = synthesize or (lambda key, crops: synthesize_batch(
        key, crops, cfg))

    def prepare(key, pool):
        k_idx, k_flip, k_synth = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, pool.shape[0])
        crops = jnp.take(pool, idx, axis=0).astype(jnp.float32) / 255.0
        if random_flip:
            flip = jax.random.bernoulli(k_flip, 0.5, (batch_size,))
            crops = jnp.where(flip[:, None, None, None],
                              crops[:, :, ::-1], crops)
        return synth(k_synth, crops)

    return prepare


class ProceduralImages:
    """Host-facing dataset of procedural images (``get_image`` contract of
    ``ZurichRAW2RGB``/``ImageFolder``) for val-set generation scripts and
    fixtures. Images are deterministic in (seed, index)."""

    def __init__(self, num_images: int, hw: Tuple[int, int] = (448, 448),
                 seed: int = 0, **gen_kwargs):
        self.num_images = num_images
        self.hw = tuple(hw)
        self.seed = seed
        self._make = jax.jit(
            lambda key: dead_leaves_image(key, self.hw, **gen_kwargs))

    def get_num_images(self) -> int:
        return self.num_images

    def __len__(self):
        return self.num_images

    def get_image(self, idx: int):
        if not 0 <= idx < self.num_images:
            raise IndexError(idx)
        key = jax.random.fold_in(jax.random.key(self.seed), idx)
        img = np.asarray(self._make(key))
        return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8), {}
