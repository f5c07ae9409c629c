"""Standalone bilinear grid_sample (torch parity utility).

The reference's MSDA fallback path is built on torch ``F.grid_sample``
(align_corners=False, zeros padding); this is the same sampler as a reusable
jnp function — the semantic ground truth for the fused MSDA/DCN kernels and
available for any torch-parity test.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_grid_sample(im: jnp.ndarray, grid: jnp.ndarray,
                         align_corners: bool = False) -> jnp.ndarray:
    """im: (B, H, W, C); grid: (B, Ho, Wo, 2) in [-1, 1] (x, y).

    Returns (B, Ho, Wo, C), zeros outside.
    """
    B, H, W, C = im.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1) * 0.5 * (W - 1)
        y = (gy + 1) * 0.5 * (H - 1)
    else:
        x = ((gx + 1) * W - 1) * 0.5
        y = ((gy + 1) * H - 1) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(im.dtype)
    ly = (y - y0).astype(im.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    imf = im.reshape(B, H * W, C)

    def corner(yi, xi):
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).astype(im.dtype)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take_along_axis(imf, flat.reshape(B, -1)[..., None], axis=1)
        return v.reshape(B, *flat.shape[1:], C), inb

    v00, m00 = corner(y0i, x0i)
    v01, m01 = corner(y0i, x0i + 1)
    v10, m10 = corner(y0i + 1, x0i)
    v11, m11 = corner(y0i + 1, x0i + 1)
    w00 = ((1 - ly) * (1 - lx) * m00)[..., None]
    w01 = ((1 - ly) * lx * m01)[..., None]
    w10 = (ly * (1 - lx) * m10)[..., None]
    w11 = (ly * lx * m11)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
