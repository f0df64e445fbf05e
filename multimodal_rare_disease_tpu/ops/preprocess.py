"""On-device image preprocessing & augmentation.

TPU-native replacement for the reference's torchvision/PIL transform
stacks (`src/image_dataset_loader.py:80-140`, `src/train_multimodal.py:317-353`,
`src/enhanced_augmentation.py:28-66`): the host stops at decoded uint8
arrays; everything else — geometry, color jitter, normalization — runs
batched on device inside the jitted step, so preprocessing overlaps with
training and feeds the MXU without host round-trips.

Design:
- ALL geometric ops (random resized crop, rotation ±15°, horizontal flip,
  center crop/resize) compose into ONE affine matrix per image and execute
  as a single bilinear gather (`affine_resample`). One gather instead of
  three separate resamples is the main bandwidth win; the reference runs
  the equivalent chain as 3-4 separate PIL/torchvision passes per image
  on the host.
- Color jitter (brightness/contrast/saturation) + ImageNet normalization
  are elementwise and fuse; a Pallas kernel (`ops/pallas/image_kernels.py`)
  implements the uint8→normalized-f32/bf16 cast+scale chain explicitly for
  the eval/predict fast path, with this XLA path as fallback.
- Everything is fixed-shape and fully vmapped: [B,256,256,3] uint8 →
  [B,224,224,3] float, per-image randomness from one folded PRNG key.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import Config

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# geometry: one fused affine resample
# ---------------------------------------------------------------------------

def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample img [H,W,C] at float coords ys/xs [h,w] with edge clamping."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    p00 = img[y0i, x0i]
    p01 = img[y0i, x1i]
    p10 = img[y1i, x0i]
    p11 = img[y1i, x1i]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def _single_affine(img: jnp.ndarray, matrix: jnp.ndarray, out_size: int
                   ) -> jnp.ndarray:
    """Apply a 2x3 output→input affine map to one [H,W,C] image."""
    ii = jnp.arange(out_size, dtype=jnp.float32)
    jj = jnp.arange(out_size, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ii, jj, indexing="ij")
    ys = matrix[0, 0] * gy + matrix[0, 1] * gx + matrix[0, 2]
    xs = matrix[1, 0] * gy + matrix[1, 1] * gx + matrix[1, 2]
    return _bilinear_sample(img, ys, xs)


def affine_resample(images: jnp.ndarray, matrices: jnp.ndarray, out_size: int
                    ) -> jnp.ndarray:
    """Batched affine warp: [B,H,W,C] × [B,2,3] → [B,out,out,C] float32.

    matrices map OUTPUT pixel coords (y,x) to INPUT coords.
    """
    images = images.astype(jnp.float32)
    return jax.vmap(partial(_single_affine, out_size=out_size))(images, matrices)


def _compose_affine(
    in_size: float,
    out_size: float,
    crop_scale: jnp.ndarray,     # scalar: fraction of input area to keep
    angle_rad: jnp.ndarray,      # scalar rotation
    flip: jnp.ndarray,           # scalar {0,1}
    shift_y: jnp.ndarray,        # [-1,1] crop-center offset within slack
    shift_x: jnp.ndarray,
) -> jnp.ndarray:
    """Build the 2x3 output→input matrix: rotate about crop center, scale
    crop→out, translate to a random crop window, optional horizontal flip."""
    crop_size = in_size * jnp.sqrt(crop_scale)
    scale = crop_size / out_size
    cos = jnp.cos(angle_rad) * scale
    sin = jnp.sin(angle_rad) * scale
    # flip x direction
    fx = jnp.where(flip > 0, -1.0, 1.0)
    # output center
    oc = (out_size - 1) / 2.0
    # crop center within the valid slack region
    slack = (in_size - crop_size) / 2.0
    cy = (in_size - 1) / 2.0 + shift_y * slack
    cx = (in_size - 1) / 2.0 + shift_x * slack
    # y_in = cos*(y-oc) - sin*fx*(x-oc) + cy ; x_in = sin*(y-oc) + cos*fx*(x-oc) + cx
    a00 = cos
    a01 = -sin * fx
    a10 = sin
    a11 = cos * fx
    t0 = cy - a00 * oc - a01 * oc
    t1 = cx - a10 * oc - a11 * oc
    return jnp.stack([jnp.stack([a00, a01, t0]), jnp.stack([a10, a11, t1])])


# ---------------------------------------------------------------------------
# geometry: separable bilinear resampling as batched matmuls (MXU-native)
# ---------------------------------------------------------------------------

def _axis_weights(scale: jnp.ndarray, shift: jnp.ndarray, out_size: int,
                  in_size: int, filter_width: float = 1.0) -> jnp.ndarray:
    """Per-image 1-D bilinear interpolation matrices W [B, out, in]:
    source coordinate src(o) = scale*o + shift; W[b,o,i] = tent((src-i)/fw),
    rows renormalized → clamp-to-edge for out-of-range sources.

    filter_width > 1 widens the tent to PIL's antialiased triangle filter
    (fw = downscale factor), matching torchvision Resize semantics when
    downsampling."""
    fw = float(max(filter_width, 1.0))
    o = jnp.arange(out_size, dtype=jnp.float32)
    i = jnp.arange(in_size, dtype=jnp.float32)
    src = scale[:, None] * o[None, :] + shift[:, None]          # [B, out]
    d = jnp.abs(src[:, :, None] - i[None, None, :])             # [B, out, in]
    w = jnp.clip(1.0 - d / fw, 0.0, 1.0)
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def separable_resample(images: jnp.ndarray,
                       scale_y: jnp.ndarray, shift_y: jnp.ndarray,
                       scale_x: jnp.ndarray, shift_x: jnp.ndarray,
                       out_size: int, filter_width: float = 1.0) -> jnp.ndarray:
    """Axis-aligned affine resample (crop / zoom / translate) of
    [B,H,W,C] via two batched matmuls — exact bilinear, no gathers.

    ~45 GFLOP for a 256-batch (sub-ms on the MXU) vs ~1.1 s for the
    equivalent XLA element-gather formulation measured on v5e.
    """
    B, H, W, C = images.shape
    x = images.astype(jnp.float32)
    Wy = _axis_weights(scale_y, shift_y, out_size, H, filter_width)
    Wx = _axis_weights(scale_x, shift_x, out_size, W, filter_width)
    x = jnp.einsum("boh,bhwc->bowc", Wy, x)
    x = jnp.einsum("bpw,bowc->bopc", Wx, x)
    return x


def _crop_params(in_size: float, out_size: float, crop_scale: jnp.ndarray,
                 shift_frac: jnp.ndarray):
    """Map (area fraction, [-1,1] center offset) → (scale, shift) for one
    axis of separable_resample."""
    crop_size = in_size * jnp.sqrt(crop_scale)
    scale = crop_size / out_size
    slack = (in_size - crop_size) / 2.0
    center = (in_size - 1.0) / 2.0 + shift_frac * slack
    shift = center - scale * (out_size - 1.0) / 2.0
    return scale, shift


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------

def color_jitter(images: jnp.ndarray, key: jax.Array,
                 brightness: float, contrast: float, saturation: float
                 ) -> jnp.ndarray:
    """Per-image random brightness/contrast/saturation on [B,H,W,3] in [0,1]."""
    B = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    bf = 1.0 + jax.random.uniform(kb, (B, 1, 1, 1), minval=-brightness,
                                  maxval=brightness)
    cf = 1.0 + jax.random.uniform(kc, (B, 1, 1, 1), minval=-contrast,
                                  maxval=contrast)
    sf = 1.0 + jax.random.uniform(ks, (B, 1, 1, 1), minval=-saturation,
                                  maxval=saturation)
    x = images * bf
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * cf + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * sf + gray
    return jnp.clip(x, 0.0, 1.0)


def normalize_images(images: jnp.ndarray,
                     dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] (or uint8 0..255) → ImageNet-normalized dtype."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    return _normalize01(x, dtype)


def _normalize01(x: jnp.ndarray, dtype) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return ((x - mean) / std).astype(dtype)


def gaussian_blur(images: jnp.ndarray, sigma: float = 1.0,
                  kernel_size: int = 5) -> jnp.ndarray:
    """Separable depthwise Gaussian blur on [B,H,W,C] (device-side
    equivalent of the reference's GaussianBlur augment,
    `src/enhanced_augmentation.py:47-50`)."""
    half = kernel_size // 2
    xs = np.arange(-half, half + 1, dtype=np.float32)
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    k = jnp.asarray(k / k.sum(), images.dtype)
    x = images
    # blur along W then H via 1-D convolutions (depthwise)
    x = jax.vmap(lambda im: _conv1d(im, k, axis=1))(x)
    x = jax.vmap(lambda im: _conv1d(im, k, axis=0))(x)
    return x


def _conv1d(img: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D same-size convolution of [H,W,C] along H (axis 0) or W (axis 1),
    edge-padded, expressed as a stack of static shifts (gather-free)."""
    half = (k.shape[0] - 1) // 2
    out = jnp.zeros_like(img)
    for i in range(k.shape[0]):
        shift = i - half
        if axis == 0:
            if shift >= 0:
                s = jnp.concatenate(
                    [img[shift:], jnp.repeat(img[-1:], shift, 0)], 0) \
                    if shift else img
            else:
                s = jnp.concatenate(
                    [jnp.repeat(img[:1], -shift, 0), img[:shift]], 0)
        else:
            if shift >= 0:
                s = jnp.concatenate(
                    [img[:, shift:], jnp.repeat(img[:, -1:], shift, 1)], 1) \
                    if shift else img
            else:
                s = jnp.concatenate(
                    [jnp.repeat(img[:, :1], -shift, 1), img[:, :shift]], 1)
        out = out + k[i] * s
    return out


def gaussian_noise(images: jnp.ndarray, key: jax.Array,
                   std: float = 0.05) -> jnp.ndarray:
    """Additive Gaussian noise on [0,1] images (ref albumentations
    GaussNoise group, `src/enhanced_augmentation.py:78-84`)."""
    return jnp.clip(images + std * jax.random.normal(key, images.shape,
                                                     images.dtype), 0.0, 1.0)


def random_erasing(images: jnp.ndarray, key: jax.Array, prob: float,
                   area_frac: Tuple[float, float] = (0.02, 0.2)) -> jnp.ndarray:
    """Per-image random rectangle erase (torchvision RandomErasing parity,
    ref `src/enhanced_augmentation.py:60-65`), fixed-shape via masking."""
    B, H, W, _ = images.shape
    kp, ka, ky, kx = jax.random.split(key, 4)
    apply = jax.random.uniform(kp, (B, 1, 1, 1)) < prob
    frac = jax.random.uniform(ka, (B,), minval=area_frac[0], maxval=area_frac[1])
    side_h = jnp.sqrt(frac) * H
    side_w = jnp.sqrt(frac) * W
    y0 = jax.random.uniform(ky, (B,)) * (H - side_h)
    x0 = jax.random.uniform(kx, (B,)) * (W - side_w)
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    inside = ((yy >= y0[:, None, None, None]) & (yy < (y0 + side_h)[:, None, None, None])
              & (xx >= x0[:, None, None, None]) & (xx < (x0 + side_w)[:, None, None, None]))
    return jnp.where(apply & inside, 0.0, images)


# ---------------------------------------------------------------------------
# public pipelines
# ---------------------------------------------------------------------------

def train_preprocess(
    images_uint8: jnp.ndarray,  # [B, S, S, 3] uint8 staging (S=256)
    key: jax.Array,
    cfg: Config,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Full random train augmentation → [B, image_size, image_size, 3].

    geometry_mode='separable' (default): flip + random resized crop as
    batched-matmul bilinear resampling (MXU), rotation via the Pallas
    kernel when available. 'gather': the reference-exact single-pass
    affine (crop∘rotate∘flip in one bilinear gather) — slow on TPU.
    """
    d = cfg.data
    B = images_uint8.shape[0]
    in_size = images_uint8.shape[1]
    k_scale, k_angle, k_flip, k_sy, k_sx, k_jit, k_erase = jax.random.split(key, 7)

    crop_scale = jax.random.uniform(k_scale, (B,), minval=d.crop_scale_min,
                                    maxval=1.0)
    max_rad = np.deg2rad(d.rotation_degrees)
    angle = jax.random.uniform(k_angle, (B,), minval=-max_rad, maxval=max_rad)
    flip = (jax.random.uniform(k_flip, (B,)) < d.horizontal_flip_prob
            ).astype(jnp.float32)
    sy = jax.random.uniform(k_sy, (B,), minval=-1.0, maxval=1.0)
    sx = jax.random.uniform(k_sx, (B,), minval=-1.0, maxval=1.0)

    if d.geometry_mode == "gather":
        mats = jax.vmap(partial(_compose_affine, float(in_size),
                                float(d.image_size)))(crop_scale, angle, flip,
                                                      sy, sx)
        x = affine_resample(images_uint8, mats, d.image_size) / 255.0
    else:
        x = images_uint8.astype(jnp.float32)
        # horizontal flip: lane reverse selected per image
        x = jnp.where(flip[:, None, None, None] > 0, x[:, :, ::-1, :], x)
        if d.rotation_degrees > 0 and d.online_rotation:
            from multimodal_rare_disease_tpu.ops.rotate import rotate_batch

            x = rotate_batch(x, angle, max_degrees=d.rotation_degrees)
        scale_y, shift_y = _crop_params(float(in_size), float(d.image_size),
                                        crop_scale, sy)
        scale_x, shift_x = _crop_params(float(in_size), float(d.image_size),
                                        crop_scale, sx)
        x = separable_resample(x, scale_y, shift_y, scale_x, shift_x,
                               d.image_size) / 255.0

    x = color_jitter(x, k_jit, d.brightness_factor, d.contrast_factor,
                     d.saturation_factor)
    if d.gaussian_blur_prob > 0 or d.gaussian_noise_std > 0:
        k_blur, k_bsel, k_noise = jax.random.split(k_erase, 3)
        if d.gaussian_blur_prob > 0:
            blurred = gaussian_blur(x)
            sel = (jax.random.uniform(k_bsel, (B,)) < d.gaussian_blur_prob)
            x = jnp.where(sel[:, None, None, None], blurred, x)
        if d.gaussian_noise_std > 0:
            x = gaussian_noise(x, k_noise, d.gaussian_noise_std)
    if d.random_erasing_prob > 0:
        x = random_erasing(x, k_erase, d.random_erasing_prob)
    return _normalize01(x, dtype)


def eval_resample_params(in_size: int, image_size: int, mode: str
                         ) -> Tuple[float, float, float]:
    """(scale, shift, filter_width) for the deterministic eval resample,
    PIL half-pixel convention: src(o) = scale*o + shift.

    mode='resize_crop': Resize(image_size+10) + CenterCrop(image_size) —
      the reference's multimodal val transform
      (`src/train_multimodal.py:343-353`). Composed into one resample:
      resize in→R (R = image_size+10), then take the central image_size
      pixels, i.e. src(o) = (o + off + 0.5)*(in/R) - 0.5, off = (R-out)/2.
    mode='resize': plain Resize(image_size) — the reference loader's val
      path (`src/image_dataset_loader.py:123-140`).

    filter_width is PIL's antialiasing triangle width (the downscale
    factor), so the output matches torchvision Resize(antialias) bilinear.
    """
    if mode == "resize":
        resize_size = image_size
    elif mode == "resize_crop":
        resize_size = image_size + 10
    else:
        raise ValueError(f"unknown eval_transform {mode!r}")
    scale = in_size / resize_size
    offset = (resize_size - image_size) / 2.0
    shift = (offset + 0.5) * scale - 0.5
    return scale, shift, max(scale, 1.0)


def eval_preprocess(
    images_uint8: jnp.ndarray,  # [B, S, S, 3] uint8
    cfg: Config,
    dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Deterministic eval transform → normalize (clean val transforms —
    deliberately NOT reproducing the reference's val-noise quirk,
    `src/train_small_data.py:93-109`).

    Geometry is selected by cfg.data.eval_transform ('resize_crop' |
    'resize', see eval_resample_params) and matches the corresponding
    torchvision/PIL transform stack bilinearly, including antialiasing.
    """
    d = cfg.data
    B = images_uint8.shape[0]
    in_size = images_uint8.shape[1]
    if in_size == d.image_size:
        # Staged at target size: host already applied the eval geometry
        # (inference fast path) — only normalize on device.
        x01 = images_uint8
        if use_pallas:
            from multimodal_rare_disease_tpu.ops.pallas.image_kernels import (
                fused_normalize_u8,
            )
            return fused_normalize_u8(x01, dtype=dtype)
        return _normalize01(x01.astype(jnp.float32) / 255.0, dtype)
    scale, shift, fw = eval_resample_params(
        in_size, d.image_size, getattr(d, "eval_transform", "resize_crop"))
    scale_b = jnp.full((B,), scale, jnp.float32)
    shift_b = jnp.full((B,), shift, jnp.float32)
    x = separable_resample(images_uint8, scale_b, shift_b, scale_b, shift_b,
                           d.image_size, filter_width=fw) / 255.0
    return _normalize01(x, dtype)


def augment_batch(images_uint8, key, cfg, train: bool,
                  dtype=jnp.float32) -> jnp.ndarray:
    if train:
        return train_preprocess(images_uint8, key, cfg, dtype)
    return eval_preprocess(images_uint8, cfg, dtype)
