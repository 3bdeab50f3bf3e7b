"""Image primitives: grayscale, resize pyramid, separable Gaussian blur.

Replaces the reference's OpenCV usage (cv::cvtColor / cv::resize /
cv::GaussianBlur inside src/PLPSLAM/feature/orb_extractor.cc and
util/image_converter.cc) with XLA ops. Everything is f32 ``[H, W]`` device
arrays; conversion from uint8 happens once on ingest.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def to_grayscale(img):
    """uint8 ``[H, W]``, ``[H, W, 1]`` or ``[H, W, 3]`` (RGB) -> f32 ``[H, W]``.

    Reference: util::convert_to_grayscale (BT.601 weights via OpenCV).
    """
    img = jnp.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 3:
        w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
        return jnp.tensordot(img.astype(jnp.float32), w, axes=([-1], [0]))
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(jnp.float32)


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """``[n_out, n_in]`` linear operator reproducing jax.image.resize's
    bilinear (antialiased triangle-filter) weights along one axis. Resize
    is linear, so resizing the identity matrix yields the exact operator;
    applying it as a matmul runs on the MXU instead of the gather-based
    resize lowering (~50x faster at pyramid sizes)."""
    # Pure numpy (this runs inside jit traces as a constant): the
    # antialiased triangle kernel jax.image.resize("bilinear") uses —
    # output i samples input at x = (i+.5)/s - .5 with a triangle of
    # radius max(1, 1/s), weights normalized.
    scale = n_out / n_in
    x = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
    j = np.arange(n_in, dtype=np.float64)
    inv_support = min(scale, 1.0)
    w = np.maximum(0.0, 1.0 - np.abs((j[None, :] - x[:, None]) * inv_support))
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def resize_bilinear(img, out_hw):
    """Bilinear resize ``[H, W] -> out_hw`` (static target shape) as two
    matmuls with precomputed interpolation operators."""
    H, W = img.shape
    A = jnp.asarray(_resize_matrix(H, out_hw[0]))   # [H', H]
    B = jnp.asarray(_resize_matrix(W, out_hw[1]))   # [W', W]
    return A @ img @ B.T


@functools.lru_cache(maxsize=32)
def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    # Pure numpy on purpose: the result is cached across calls, and a jnp
    # array materialized inside a jit trace must never be cached (it would
    # be a leaked tracer when reused from another trace).
    half = ksize // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with replicate padding (matches
    cv::GaussianBlur(7,7,2,2,BORDER_REFLECT_101) closely enough for BRIEF).
    """
    # Shifted weighted adds instead of lax.conv: a single-channel conv
    # wastes the MXU's 128-lane feature dimension and lowers to a path
    # ~100x slower than 2*ksize VPU fused multiply-adds.
    k = _gaussian_kernel_1d(ksize, sigma)
    half = ksize // 2
    H, W = img.shape
    x = jnp.pad(img, ((half, half), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + float(k[i]) * jax.lax.slice(x, (i, 0), (i + H, W))
    x = jnp.pad(out, ((0, 0), (half, half)), mode="reflect")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + float(k[i]) * jax.lax.slice(x, (0, i), (H, i + W))
    return out


def pyramid_shapes(rows: int, cols: int, num_levels: int, scale_factor: float):
    """Static per-level (H, W) shapes for the image pyramid."""
    shapes = []
    for lv in range(num_levels):
        s = 1.0 / (scale_factor**lv)
        shapes.append((max(1, int(round(rows * s))), max(1, int(round(cols * s)))))
    return shapes


ATLAS_GAP = 24  # inter-level padding: > IC-angle patch radius (15) + blur


def atlas_layout(shapes, gap: int = ATLAS_GAP):
    """Vertical pyramid-atlas layout: per-level row offsets + atlas shape.

    All levels are stacked into ONE image (left-aligned, ``gap`` zero rows
    between levels) so FAST scoring, NMS, IC moments and the BRIEF blur
    run as one dense op each instead of one per level — the dominant cost
    of the per-level pyramid was op-dispatch count, not pixels (round-3
    profiling: 8 x ~150 small kernels/frame). The gap exceeds every
    windowed-op radius used at keypoints (EDGE_MARGIN guarantees keypoints
    stay >= 19 px inside their level, so no window ever crosses a level
    boundary)."""
    offsets = []
    y = 0
    W = 0
    for (h, w) in shapes:
        offsets.append(y)
        y += h + gap
        W = max(W, w)
    return offsets, y - gap, W


def build_atlas(img, shapes, offsets, atlas_h: int, atlas_w: int):
    """Resize ``img`` to every pyramid level and paint the levels into the
    vertical atlas (zero gaps between them)."""
    atlas = jnp.zeros((atlas_h, atlas_w), img.dtype)
    for lv, ((h, w), y0) in enumerate(zip(shapes, offsets)):
        lvl = img if lv == 0 else resize_bilinear(img, (h, w))
        atlas = jax.lax.dynamic_update_slice(atlas, lvl, (y0, 0))
    return atlas


def build_pyramid(img, num_levels: int, scale_factor: float):
    """f32 ``[H, W]`` -> list of f32 arrays, one per level (static shapes).

    Reference: orb_extractor::compute_image_pyramid
    (src/PLPSLAM/feature/orb_extractor.cc:315) resizes iteratively
    level-to-level; we resize from level 0 with the cumulative scale, which
    is sharper and fully parallel across levels.
    """
    H, W = img.shape
    shapes = pyramid_shapes(H, W, num_levels, scale_factor)
    return [img if lv == 0 else resize_bilinear(img, shapes[lv]) for lv in range(num_levels)]
