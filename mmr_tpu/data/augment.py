"""On-device (jitted, vmapped) augmentation pipelines.

Rebuilds both augmentation surfaces of the reference as pure JAX transforms
that run on the TPU instead of 14 CPU worker processes (SURVEY.md §7.3(3)):

1. nnU-Net-style pipeline (``Pre_Process.py:278-463``; parameter regimes
   ``:680-785``): SpatialTransform (rotation p=0.2, scaling p=0.2) → Gaussian
   noise var U(0,0.1) p=0.1 → Gaussian blur σ U(0.5,1) p=0.2 (p_per_channel
   0.5) → multiplicative brightness p=0.15 → contrast (preserve range) p=0.15
   → simulated low-resolution scale U(0.5,1) p=0.25 → gamma p=0.3
   (non-inverted instance; the inverted instance has p=0 in the reference) →
   mirror. Two regimes: ``soft`` (default; rot ±10°, ranges 0.9–1.1, mirror W
   only — the reference hard-codes heavy_augmentation=False at ``:597``) and
   ``heavy`` (nnU-Net: rot ±π, scale 0.7–1.4, ranges 0.75–1.25, gamma
   0.7–1.5, mirror both axes, enlarged initial patch).

2. Path-A transforms (``SegNetDataLoaderV1_SAR.py:185-209``): consistent
   hflip/vflip/rot90 each p=0.5, brightness/contrast 0.9–1.1 image-only.

All randomness is keyed; per-sample keys derive from a single batch key, so a
batch augments identically regardless of device sharding.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLUR_RADIUS = 4  # batchgenerators truncates at 4σ; σ≤1 → radius 4 suffices


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    patch_size: tuple[int, int] = (512, 640)
    rotation: bool = True
    scaling: bool = True
    gaussian_noise: bool = True
    gaussian_blur: bool = True
    brightness: bool = True
    contrast: bool = True
    low_resolution: bool = True
    gamma: bool = True
    mirror: bool = True
    heavy: bool = False
    # per-sample spatial-warp parameters (the reference's exact distribution)
    # cost pathological per-sample-coordinate gathers on TPU; default draws
    # one rotation/scale per microbatch instead (intensity transforms and
    # mirroring stay per-sample either way)
    per_sample_spatial: bool = False

    # regime-dependent ranges (Pre_Process.py:713-771)
    @property
    def rot_range(self) -> float:
        if not self.heavy:
            return 0.174533  # ±10°
        ph, pw = self.patch_size
        return np.pi * 15 / 180 if max(ph, pw) / min(ph, pw) > 1.5 else np.pi

    @property
    def scale_range(self):
        return (0.7, 1.4) if self.heavy else (0.9, 1.1)

    @property
    def brightness_range(self):
        return (0.75, 1.25) if self.heavy else (0.9, 1.1)

    @property
    def contrast_range(self):
        return (0.75, 1.25) if self.heavy else (0.9, 1.1)

    @property
    def gamma_range(self):
        return (0.7, 1.5) if self.heavy else (0.9, 1.1)

    @property
    def mirror_axes(self) -> tuple[int, ...]:
        return (0, 1) if self.heavy else (1,)  # (H, W) axes; soft mirrors W only

    @property
    def initial_patch_size(self) -> tuple[int, int]:
        """Enlarged source patch so heavy rotation/scaling never samples outside
        (nnU-Net ``get_initial_patch_size``; soft regime: equal to patch)."""
        if not self.heavy:
            return self.patch_size
        rot = self.rot_range
        ph, pw = self.patch_size
        rot = min(rot, np.pi / 2)
        c, s = np.abs(np.cos(rot)), np.abs(np.sin(rot))
        h = ph * c + pw * s
        w = ph * s + pw * c
        scale = 1 / min(self.scale_range)
        return (int(np.ceil(h * scale)), int(np.ceil(w * scale)))


def _bg_contrast_batch(key, lo, hi, shape):
    """batchgenerators BGContrast, batched: U(lo,1) w.p. 0.5 (if lo<1) else
    U(1,hi) — one draw per (sample, channel)."""
    k1, k2, k3 = jax.random.split(key, 3)
    below = jax.random.uniform(k1, shape, minval=lo, maxval=1.0)
    above = jax.random.uniform(k2, shape, minval=1.0, maxval=hi)
    return jnp.where(jax.random.bernoulli(k3, 0.5, shape), below, above)


def _affine_sample(img_hwc, mask_hw, angle, scale, out_hw):
    """Rotate+scale about the center, then center-crop to ``out_hw``.
    Image: bilinear, constant 0; mask: nearest."""
    ih, iw = img_hwc.shape[0], img_hwc.shape[1]
    oh, ow = out_hw
    yy = jnp.arange(oh, dtype=jnp.float32) - (oh - 1) / 2.0
    xx = jnp.arange(ow, dtype=jnp.float32) - (ow - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # inverse map: output -> input coords (scale then rotate)
    sy = (gy * ca - gx * sa) * scale + (ih - 1) / 2.0
    sx = (gy * sa + gx * ca) * scale + (iw - 1) / 2.0
    coords = jnp.stack([sy, sx])
    img_out = jax.vmap(
        lambda ch: jax.scipy.ndimage.map_coordinates(ch, coords, order=1, mode="constant"),
        in_axes=-1, out_axes=-1,
    )(img_hwc)
    mask_out = jax.scipy.ndimage.map_coordinates(
        mask_hw.astype(jnp.float32), coords, order=0, mode="constant")
    return img_out, mask_out.astype(mask_hw.dtype)


def _affine_batch_shared(images, masks, angle, scale, out_hw):
    """Warp the whole batch with ONE (angle, scale): sampling coordinates are
    shared across batch and channels, so the gather has shared indices — the
    fast TPU path (per-sample coordinate gathers measured ~1 s per
    32x512x512 step and minutes of compile)."""
    b, ih, iw, c = images.shape
    oh, ow = out_hw
    yy = jnp.arange(oh, dtype=jnp.float32) - (oh - 1) / 2.0
    xx = jnp.arange(ow, dtype=jnp.float32) - (ow - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # source-center convention matches _center_crop's floor offset
    # ((ih-oh)//2) so the identity warp (angle=0, scale=1) is EXACTLY the
    # center crop the lax.cond skip path takes — no half-pixel bilinear blend
    # when ih-oh is odd (for even margins this equals the old (ih-1)/2)
    cy = (ih - oh) // 2 + (oh - 1) / 2.0
    cx = (iw - ow) // 2 + (ow - 1) / 2.0
    sy = (gy * ca - gx * sa) * scale + cy
    sx = (gy * sa + gx * ca) * scale + cx
    # bf16 pixel gathers: halves the ~100 MB/corner bilinear traffic; the
    # images are 8-bit-origin so bf16 sampling noise (~3e-3) is far below
    # the augmentation's own intensity jitter. The manual take-based corner
    # formulation (same math as map_coordinates(order=1, mode='constant'):
    # OOB corners contribute 0 via the effective weights) lowers to gathers
    # measured 2.2x faster than map_coordinates' on the bench chip.
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy, fx = sy - y0, sx - x0
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    flat = images.astype(jnp.bfloat16).transpose(0, 3, 1, 2).reshape(
        b * c, ih * iw)
    acc = jnp.zeros((b * c, oh * ow), jnp.bfloat16)
    for dy in (0, 1):
        for dx in (0, 1):
            yc, xc = y0i + dy, x0i + dx
            wgt = (fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx)
            w_eff = jnp.where((yc >= 0) & (yc < ih) & (xc >= 0) & (xc < iw),
                              wgt, 0.0)
            idx = (jnp.clip(yc, 0, ih - 1) * iw
                   + jnp.clip(xc, 0, iw - 1)).reshape(-1)
            acc = acc + jnp.take(flat, idx, axis=1) \
                * w_eff.reshape(-1).astype(jnp.bfloat16)[None]
    warped = acc.astype(images.dtype).reshape(b, c, oh, ow).transpose(
        0, 2, 3, 1)

    yn = jnp.round(sy).astype(jnp.int32)
    xn = jnp.round(sx).astype(jnp.int32)
    inb_n = (yn >= 0) & (yn < ih) & (xn >= 0) & (xn < iw)
    idxn = (jnp.clip(yn, 0, ih - 1) * iw
            + jnp.clip(xn, 0, iw - 1)).reshape(-1)
    # int32 gathers hit a slow lowering on this backend — route them via f32
    # (exact for class ids), 1-byte masks gather natively
    msrc = masks if masks.dtype.itemsize == 1 else masks.astype(jnp.float32)
    masks_w = jnp.take(msrc.reshape(b, ih * iw), idxn, axis=1)
    masks_w = jnp.where(inb_n.reshape(-1)[None, :], masks_w,
                        jnp.zeros((), msrc.dtype))
    return warped, masks_w.astype(masks.dtype).reshape(b, oh, ow)


def _center_crop(images, masks, out_hw):
    ih, iw = images.shape[1], images.shape[2]
    oh, ow = out_hw
    y0, x0 = (ih - oh) // 2, (iw - ow) // 2
    return (images[:, y0:y0 + oh, x0:x0 + ow], masks[:, y0:y0 + oh, x0:x0 + ow])


def _gaussian_blur_batch(images, sigmas, ch_mask):
    """Per-sample-sigma separable Gaussian blur as ONE grouped conv pair:
    the batch folds into the channel dim (feature_group_count = B*C), so
    per-sample kernels never fall back to a sequential per-sample conv."""
    b, h, w, c = images.shape
    r = _BLUR_RADIUS
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    wgt = jnp.exp(-0.5 * (x[None, :] / jnp.maximum(sigmas[:, None], 1e-6)) ** 2)
    wgt = wgt / wgt.sum(axis=1, keepdims=True)        # (B, 2r+1)
    k = jnp.repeat(wgt, c, axis=0).T                   # (2r+1, B*C)
    kern_h = k[:, None, None, :]                       # (2r+1, 1, 1, B*C)
    kern_w = k[None, :, None, :]                       # (1, 2r+1, 1, B*C)
    dn = ("NHWC", "HWIO", "NHWC")
    kern_h = kern_h.astype(images.dtype)
    kern_w = kern_w.astype(images.dtype)
    y = jnp.pad(images, [(0, 0), (r, r), (r, r), (0, 0)], mode="edge")
    y = y.transpose(1, 2, 0, 3).reshape(1, h + 2 * r, w + 2 * r, b * c)
    y = jax.lax.conv_general_dilated(
        y, kern_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=b * c, preferred_element_type=jnp.float32)
    y = jax.lax.conv_general_dilated(
        y.astype(images.dtype), kern_w, (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=b * c,
        preferred_element_type=jnp.float32)
    y = y.astype(images.dtype).reshape(h, w, b, c).transpose(2, 0, 1, 3)
    return jnp.where(ch_mask[:, None, None, :], y, images)


def _simulate_low_res_shared(images, scale, gate_bc):
    """Shared-scale low-resolution simulation via snapped index takes (two
    shared-index gathers, one per axis)."""
    h, w = images.shape[1], images.shape[2]
    iy = jnp.floor(jnp.floor(jnp.arange(h, dtype=jnp.float32) * scale) / scale
                   + 0.5).astype(jnp.int32).clip(0, h - 1)
    ix = jnp.floor(jnp.floor(jnp.arange(w, dtype=jnp.float32) * scale) / scale
                   + 0.5).astype(jnp.int32).clip(0, w - 1)
    # bf16 takes: halves the two ~100 MB shared-index gathers; values are
    # copied (not interpolated) so the only loss is the bf16 quantization
    # of 8-bit-origin pixels
    low = jnp.take(jnp.take(images.astype(jnp.bfloat16), iy, axis=1),
                   ix, axis=2).astype(images.dtype)
    return jnp.where(gate_bc[:, None, None, :], low, images)


def _affine_batch_shared_u8(images, masks, angle, scale, out_hw):
    """uint8-source variant of ``_affine_batch_shared``: the four bilinear
    corner gathers read the RAW uint8 image (≈4× less gather traffic than
    f32, ≈2× less than the bf16 path), out-of-bounds corners are folded into
    the (batch-shared) effective weights, and the weight-sum map is returned
    so the caller can apply per-channel affine normalization AFTER the warp
    with semantics identical to warping normalized data with cval=0:
    ``Σ w·(v/255−m)/s·inb = (Σ w_eff·v)/(255·s) − (m/s)·Σ w_eff``.

    Returns ``(acc bf16 (B,oh,ow,C) in 0..255 scale, wsum f32 (oh,ow),
    masks_warped)``. Masks gather nearest (round-half-even, matching
    ``map_coordinates(order=0)``) with OOB → 0."""
    b, ih, iw, c = images.shape
    oh, ow = out_hw
    yy = jnp.arange(oh, dtype=jnp.float32) - (oh - 1) / 2.0
    xx = jnp.arange(ow, dtype=jnp.float32) - (ow - 1) / 2.0
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    cy = (ih - oh) // 2 + (oh - 1) / 2.0
    cx = (iw - ow) // 2 + (ow - 1) / 2.0
    sy = (gy * ca - gx * sa) * scale + cy
    sx = (gy * sa + gx * ca) * scale + cx

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy, fx = sy - y0, sx - x0
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    flat = images.transpose(0, 3, 1, 2).reshape(b * c, ih * iw)
    acc = jnp.zeros((b * c, oh * ow), jnp.bfloat16)
    wsum = jnp.zeros((oh, ow), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            yc, xc = y0i + dy, x0i + dx
            wgt = (fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx)
            inb = (yc >= 0) & (yc < ih) & (xc >= 0) & (xc < iw)
            w_eff = jnp.where(inb, wgt, 0.0)
            idx = (jnp.clip(yc, 0, ih - 1) * iw
                   + jnp.clip(xc, 0, iw - 1)).reshape(-1)
            g = jnp.take(flat, idx, axis=1)  # (b*c, oh*ow) uint8
            acc = acc + g.astype(jnp.bfloat16) \
                * w_eff.reshape(-1).astype(jnp.bfloat16)[None]
            wsum = wsum + w_eff
    warped = acc.reshape(b, c, oh, ow).transpose(0, 2, 3, 1)

    yn = jnp.round(sy).astype(jnp.int32)
    xn = jnp.round(sx).astype(jnp.int32)
    inb_n = (yn >= 0) & (yn < ih) & (xn >= 0) & (xn < iw)
    idxn = (jnp.clip(yn, 0, ih - 1) * iw
            + jnp.clip(xn, 0, iw - 1)).reshape(-1)
    # 1-byte masks gather natively; int32 routes via f32 (slow int lowering)
    msrc = masks if masks.dtype.itemsize == 1 else masks.astype(jnp.float32)
    mw = jnp.take(msrc.reshape(b, ih * iw), idxn, axis=1)
    mw = jnp.where(inb_n.reshape(-1)[None, :], mw, jnp.zeros((), msrc.dtype))
    return warped, wsum, mw.astype(masks.dtype).reshape(b, oh, ow)


@functools.partial(jax.jit, static_argnames=("cfg", "mean", "std"))
def augment_train_batch_u8(key, images, masks, cfg: AugmentConfig,
                           mean: tuple, std: tuple):
    """uint8-native fast path of :func:`augment_train_batch` (same transform
    sequence, same per-key randomness): images arrive **uint8 0..255**
    (compact-transfer contract), masks any int dtype with class ids < 256.

    The spatial warp / center-crop runs directly on the uint8 sources and the
    per-channel affine normalization ``(x/255 − mean)/std`` is applied AFTER
    it — exactly equivalent to the f32 path's normalize-then-warp because
    normalization is per-channel affine and the warp's cval=0 fill (in
    normalized space) is reconstructed from the corners' in-bounds weight-sum
    map. The intensity chain and mirroring are the shared bf16 implementation.

    Returns ``(bf16 normalized images, masks)``. Requires
    ``per_sample_spatial=False`` (that parity path takes the f32 route in
    ``train/steps.py``)."""
    assert not cfg.per_sample_spatial, \
        "per-sample spatial parity runs use the f32 path"
    b, c = images.shape[0], images.shape[-1]
    ks = iter(jax.random.split(key, 26))

    # identical draw sequence to augment_train_batch's batch-shared branch
    rot_do = jax.random.bernoulli(next(ks), 0.2) & bool(cfg.rotation)
    angle = jnp.where(rot_do, jax.random.uniform(
        next(ks), (), minval=-cfg.rot_range, maxval=cfg.rot_range), 0.0)
    scale_do = jax.random.bernoulli(next(ks), 0.2) & bool(cfg.scaling)
    scale = jnp.where(scale_do, jax.random.uniform(
        next(ks), (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]), 1.0)

    oh, ow = cfg.patch_size

    def _warp(im, mk):
        return _affine_batch_shared_u8(im, mk, angle, scale, cfg.patch_size)

    def _crop(im, mk):
        imc, mkc = _center_crop(im, mk, cfg.patch_size)
        return (imc.astype(jnp.bfloat16), jnp.ones((oh, ow), jnp.float32),
                mkc)

    acc, wsum, masks = jax.lax.cond(rot_do | scale_do, _warp, _crop,
                                    images, masks)
    inv = (1.0 / (255.0 * np.asarray(std, np.float32)))
    off = (np.asarray(mean, np.float32) / np.asarray(std, np.float32))
    images = (acc * jnp.asarray(inv, jnp.bfloat16)
              - jnp.asarray(off, jnp.bfloat16)
              * wsum[None, :, :, None].astype(jnp.bfloat16))

    return _intensity_and_mirror(ks, images, masks, cfg, b, c)


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_train_batch(key, images, masks, cfg: AugmentConfig):
    """images (N, iH, iW, C) f32 in [0,1]; masks (N, iH, iW) int →
    patch-sized augmented batch.

    Output dtype: **bfloat16** whenever any intensity transform is enabled
    (the chain runs in bf16 to halve its HBM traffic; 8-bit-origin pixels
    lose nothing relevant), otherwise the input dtype. Consumers needing f32
    (external parity comparisons) should cast; the train step's model casts
    to its compute dtype anyway.

    All randomness is drawn in ~20 bulk ops (per-sample key plumbing costs
    ~1 s/step in tiny threefry draws). Spatial transforms (rotation/scaling/
    low-res scale) draw **one parameter per microbatch** by default — the
    per-sample-coordinate gathers they would otherwise need are pathologically
    slow on TPU; intensity transforms and mirroring remain fully per-sample.
    Set ``per_sample_spatial=True`` for the reference's exact per-sample
    spatial distribution (CPU/parity runs)."""
    b, c = images.shape[0], images.shape[-1]
    ks = iter(jax.random.split(key, 26))

    # ---- spatial (rotation p=0.2, scaling p=0.2) + center crop ----
    if cfg.per_sample_spatial:
        rot_do = jax.random.bernoulli(next(ks), 0.2, (b,)) & bool(cfg.rotation)
        angles = jnp.where(rot_do, jax.random.uniform(
            next(ks), (b,), minval=-cfg.rot_range, maxval=cfg.rot_range), 0.0)
        scale_do = jax.random.bernoulli(next(ks), 0.2, (b,)) & bool(cfg.scaling)
        scales = jnp.where(scale_do, jax.random.uniform(
            next(ks), (b,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]), 1.0)
        images, masks = jax.vmap(
            lambda i, m, a, s: _affine_sample(i, m, a, s, cfg.patch_size)
        )(images, masks, angles, scales)
    else:
        rot_do = jax.random.bernoulli(next(ks), 0.2) & bool(cfg.rotation)
        angle = jnp.where(rot_do, jax.random.uniform(
            next(ks), (), minval=-cfg.rot_range, maxval=cfg.rot_range), 0.0)
        scale_do = jax.random.bernoulli(next(ks), 0.2) & bool(cfg.scaling)
        scale = jnp.where(scale_do, jax.random.uniform(
            next(ks), (), minval=cfg.scale_range[0], maxval=cfg.scale_range[1]), 1.0)
        # identity warp (p = 0.8·0.8) is exactly a center crop — skip the
        # five ~100 MB bilinear/nearest gathers (~14 ms/step on the bench
        # chip) whenever neither rotation nor scaling fires this batch
        images, masks = jax.lax.cond(
            rot_do | scale_do,
            lambda im, mk: _affine_batch_shared(im, mk, angle, scale,
                                                cfg.patch_size),
            lambda im, mk: _center_crop(im, mk, cfg.patch_size),
            images, masks)

    return _intensity_and_mirror(ks, images, masks, cfg, b, c)


def _intensity_and_mirror(ks, images, masks, cfg: AugmentConfig, b: int,
                          c: int):
    """Intensity-transform chain + mirroring, shared by the f32 and uint8
    entry points (``ks`` continues the caller's 26-key draw stream so both
    paths produce identical randomness for one key)."""
    # the intensity chain runs in bf16 (halves the ~200 MB/transform HBM
    # traffic at 32×512²; statistics reductions upcast to f32 inside their
    # fused reduces, so only storage precision drops — ~0.4% relative, far
    # below the transforms' own jitter ranges). All-off configs skip the
    # cast and stay bit-exact.
    if (cfg.gaussian_noise or cfg.gaussian_blur or cfg.brightness
            or cfg.contrast or cfg.low_resolution or cfg.gamma):
        images = images.astype(jnp.bfloat16)

    # ---- gaussian noise (p=0.1, var U(0,0.1), channels synced) ----
    if cfg.gaussian_noise:
        do = jax.random.bernoulli(next(ks), 0.1, (b, 1, 1, 1))
        var = jax.random.uniform(next(ks), (b, 1, 1, 1), minval=0.0, maxval=0.1)
        noise = jax.random.normal(next(ks), images.shape, jnp.bfloat16)
        images = jnp.where(
            do, images + noise * jnp.sqrt(var).astype(jnp.bfloat16), images)

    # ---- gaussian blur (p=0.2, sigma U(0.5,1), p_per_channel=0.5) ----
    if cfg.gaussian_blur:
        do = jax.random.bernoulli(next(ks), 0.2, (b, 1))
        sigmas = jax.random.uniform(next(ks), (b,), minval=0.5, maxval=1.0)
        ch = jax.random.bernoulli(next(ks), 0.5, (b, c)) & do
        images = _gaussian_blur_batch(images, sigmas, ch)

    # ---- multiplicative brightness (p=0.15, per channel) ----
    if cfg.brightness:
        do = jax.random.bernoulli(next(ks), 0.15, (b, 1))
        mult = _bg_contrast_batch(next(ks), *cfg.brightness_range, (b, c))
        mult = jnp.where(do, mult, 1.0)
        images = (images * mult[:, None, None, :]).astype(jnp.bfloat16)

    # ---- contrast, preserve range (p=0.15, per channel) ----
    if cfg.contrast:
        do = jax.random.bernoulli(next(ks), 0.15, (b, 1))
        fac = jnp.where(do, _bg_contrast_batch(next(ks), *cfg.contrast_range, (b, c)), 1.0)
        imf = images.astype(jnp.float32)  # f32-accumulated stats
        mean = imf.mean(axis=(1, 2), keepdims=True)
        mn = imf.min(axis=(1, 2), keepdims=True)
        mx = imf.max(axis=(1, 2), keepdims=True)
        images = jnp.clip((images - mean) * fac[:, None, None, :] + mean,
                          mn, mx).astype(jnp.bfloat16)

    # ---- simulated low resolution (p=0.25, scale U(0.5,1), per-ch 0.5) ----
    if cfg.low_resolution:
        do = jax.random.bernoulli(next(ks), 0.25, (b, 1))
        lscale = jax.random.uniform(next(ks), (), minval=0.5, maxval=1.0)
        ch = jax.random.bernoulli(next(ks), 0.5, (b, c)) & do
        images = _simulate_low_res_shared(images, lscale, ch)

    # ---- gamma (p=0.3, non-inverted, retain stats, per channel) ----
    if cfg.gamma:
        do = jax.random.bernoulli(next(ks), 0.3, (b, 1))
        g = jnp.where(do, _bg_contrast_batch(next(ks), *cfg.gamma_range, (b, c)), 1.0)
        imf = images.astype(jnp.float32)  # f32-accumulated stats
        mn = imf.min(axis=(1, 2), keepdims=True)
        rng_ = imf.max(axis=(1, 2), keepdims=True) - mn
        mean = imf.mean(axis=(1, 2), keepdims=True)
        std = imf.std(axis=(1, 2), keepdims=True)
        norm = (images - mn) / (rng_ + 1e-7)
        gam = jnp.power(jnp.clip(norm, 1e-7, 1.0), g[:, None, None, :]) * (rng_ + 1e-7) + mn
        gam = (gam - gam.mean(axis=(1, 2), keepdims=True)) / (
            gam.std(axis=(1, 2), keepdims=True) + 1e-8) * std + mean
        images = jnp.where(do[:, :, None, None], gam,
                           images).astype(jnp.bfloat16)

    # ---- mirror (p=0.5 per sample per allowed axis) ----
    if cfg.mirror:
        for i, ax in enumerate(cfg.mirror_axes):
            do = jax.random.bernoulli(next(ks), 0.5, (b, 1, 1, 1))
            images = jnp.where(do, jnp.flip(images, axis=ax + 1), images)
            masks = jnp.where(do[..., 0], jnp.flip(masks, axis=ax + 1), masks)

    return images, masks


@functools.partial(jax.jit, static_argnames=("patch_size",))
def center_crop_batch(images, masks, patch_size: tuple[int, int]):
    """Validation path: deterministic center crop (the reference's validation
    pipeline is SpatialTransform-only, Pre_Process.py:450-462)."""
    ih, iw = images.shape[1], images.shape[2]
    ph, pw = patch_size
    y0, x0 = (ih - ph) // 2, (iw - pw) // 2
    return (images[:, y0:y0 + ph, x0:x0 + pw], masks[:, y0:y0 + ph, x0:x0 + pw])


# --------------------------------------------------------------- Path-A style

def _rotate90_same_canvas(a_hw, do):
    """torchvision ``TF.rotate(x, 90)`` semantics: rotate content 90° CCW about
    the center, same output canvas (corners cropped / zero-filled for
    non-square), nearest interpolation."""
    h, w = a_hw.shape[0], a_hw.shape[1]
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    # inverse of 90° CCW: source = (cy + (x - cx), cx - (y - cy))
    sy = cy + (gx - cx)
    sx = cx - (gy - cy)
    rot = jax.scipy.ndimage.map_coordinates(
        a_hw.astype(jnp.float32), jnp.stack([sy, sx]), order=0, mode="constant")
    return jnp.where(do, rot.astype(a_hw.dtype), a_hw)


@jax.jit
def augment_path_a_batch(key, images, gts, masks):
    """Path-A train aug (SegNetDataLoaderV1_SAR.py:185-209): consistent
    hflip / vflip / rotate-90° each p=0.5 on (img, gt, mask); then image-only
    brightness (p=0.5, ×U(0.9,1.1), torchvision ``adjust_brightness``) and
    contrast (p=0.5, torchvision ``adjust_contrast`` grayscale-mean blend)."""

    def one(k, img, gt, m):
        ks = jax.random.split(k, 7)
        do_h = jax.random.bernoulli(ks[0], 0.5)
        do_v = jax.random.bernoulli(ks[1], 0.5)
        do_r = jax.random.bernoulli(ks[2], 0.5)

        def fl(a, h_axis):
            a = jnp.where(do_h, jnp.flip(a, axis=h_axis + 1), a)
            a = jnp.where(do_v, jnp.flip(a, axis=h_axis), a)
            return a

        img, gt, m = fl(img, 0), fl(gt, 0), fl(m, 0)
        img = jax.vmap(lambda ch: _rotate90_same_canvas(ch, do_r),
                       in_axes=-1, out_axes=-1)(img)
        gt = jax.vmap(lambda ch: _rotate90_same_canvas(ch, do_r),
                      in_axes=-1, out_axes=-1)(gt)
        m = _rotate90_same_canvas(m, do_r)

        bright = jax.random.uniform(ks[3], (), minval=0.9, maxval=1.1)
        img = jnp.where(jax.random.bernoulli(ks[4], 0.5),
                        jnp.clip(img * bright, 0.0, 1.0), img)
        contrast = jax.random.uniform(ks[5], (), minval=0.9, maxval=1.1)
        gray_mean = jnp.mean(
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        img = jnp.where(jax.random.bernoulli(ks[6], 0.5),
                        jnp.clip(contrast * img + (1 - contrast) * gray_mean, 0.0, 1.0),
                        img)
        return img, gt, m

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(keys, images, gts, masks)
