"""Image resampling ops with exact reference semantics, MXU-shaped.

The reference resizes the conditioning image for CLIP with a gaussian
pre-blur followed by torch bicubic interpolation with align_corners=True
(reference animation/pipelines/inference_pipeline_animation.py:99-125), and
upsamples UNet/VAE features with nearest-neighbour x2 (unet.py:1799,
vae.py:771).

On TPU, separable resampling is two small dense matmuls (out = W_h @ x @
W_w^T), which maps straight onto the MXU and is exact: the interpolation
weight matrices are computed on host with float64 and baked in as constants.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel, a=-0.75 (torch's bicubic)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def _bicubic_weights_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] float32 row-stochastic interpolation matrix,
    torch F.interpolate(mode="bicubic", align_corners=True) semantics."""
    if out_size == 1:
        w = np.zeros((1, in_size), dtype=np.float64)
        w[0, 0] = 1.0
        return w.astype(np.float32)
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    i0 = np.floor(coords).astype(np.int64)
    t = coords - i0
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(i0 + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - t)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def resize_bicubic_align_corners(x, out_h: int, out_w: int):
    """Bicubic align-corners resize of [..., H, W, C] channels-last images."""
    h, w = x.shape[-3], x.shape[-2]
    orig_dtype = x.dtype
    wh = jnp.asarray(_bicubic_weights_align_corners(h, out_h))
    ww = jnp.asarray(_bicubic_weights_align_corners(w, out_w))
    x32 = x.astype(jnp.float32)
    x32 = jnp.einsum("oh,...hwc->...owc", wh, x32)
    x32 = jnp.einsum("ow,...hwc->...hoc", ww, x32)
    return x32.astype(orig_dtype)


def upsample_nearest_2x(x):
    """Nearest-neighbour x2 upsample of [N, H, W, C]."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _gaussian_1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - size // 2
    if size % 2 == 0:
        x = x + 0.5
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def gaussian_blur(x, kernel_size: tuple[int, int], sigma: tuple[float, float]):
    """Separable gaussian blur with reflect padding, [N, H, W, C].

    Matches the reference `_gaussian_blur2d` (kornia-style: x-pass then
    y-pass, reflect padding; inference_pipeline_animation.py:44-96)."""
    ky, kx = kernel_size
    gy = jnp.asarray(_gaussian_1d(ky, sigma[0]))
    gx = jnp.asarray(_gaussian_1d(kx, sigma[1]))
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)

    # x direction
    pl_, pr = (kx - 1) // 2, (kx - 1) - (kx - 1) // 2
    xp = jnp.pad(x32, ((0, 0), (0, 0), (pl_, pr), (0, 0)), mode="reflect")
    x32 = _sepconv(xp, gx, axis=2)
    # y direction
    pt, pb = (ky - 1) // 2, (ky - 1) - (ky - 1) // 2
    xp = jnp.pad(x32, ((0, 0), (pt, pb), (0, 0), (0, 0)), mode="reflect")
    x32 = _sepconv(xp, gy, axis=1)
    return x32.astype(orig_dtype)


def _sepconv(x, kernel, axis: int):
    """1-D valid convolution of [N, H, W, C] along `axis` with a [K] kernel,
    expressed as a shifted-slice weighted sum so XLA fuses it elementwise."""
    k = kernel.shape[0]
    out = x.shape[axis] - k + 1
    slices = [jax.lax.dynamic_slice_in_dim(x, i, out, axis=axis) for i in range(k)]
    return sum(s * kernel[i] for i, s in enumerate(slices))


def resize_antialias(x, out_h: int, out_w: int):
    """Gaussian-blur + bicubic(align_corners=True) downscale of [N, H, W, C]
    in [-1, 1]; the CLIP-conditioning resize of the reference
    (inference_pipeline_animation.py:99-125)."""
    h, w = x.shape[1], x.shape[2]
    factors = (h / out_h, w / out_w)
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = (int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3)))
    ks = (ks[0] + 1 if ks[0] % 2 == 0 else ks[0], ks[1] + 1 if ks[1] % 2 == 0 else ks[1])
    x = gaussian_blur(x, ks, sigmas)
    return resize_bicubic_align_corners(x, out_h, out_w)
