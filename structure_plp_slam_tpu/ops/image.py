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


def resize_bilinear(img, out_hw):
    """Bilinear resize ``[H, W] -> out_hw`` (static target shape)."""
    return jax.image.resize(img, out_hw, method="bilinear")


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
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    half = ksize // 2
    x = jnp.pad(img, ((half, half), (0, 0)), mode="reflect")
    # Convolve rows then cols via conv_general_dilated on [1, 1, H, W].
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )
    x = jnp.pad(x[0, 0], ((0, 0), (half, half)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )
    return x[0, 0]


def pyramid_shapes(rows: int, cols: int, num_levels: int, scale_factor: float):
    """Static per-level (H, W) shapes for the image pyramid."""
    shapes = []
    for lv in range(num_levels):
        s = 1.0 / (scale_factor**lv)
        shapes.append((max(1, int(round(rows * s))), max(1, int(round(cols * s)))))
    return shapes


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
