"""Modulated deformable convolution (DCNv2) as bilinear-gather + matmul.

Replaces the mmcv DCNv2 CUDA op used in the reference image backbone's
stages 3-4 (config dcn=DCNv2 at /root/reference/projects/UniBEV/configs/
unibev/unibev_nus_LC_cnw_256_modality_dropout.py:235-236).

TPU shape of the computation: the learned offsets move each kernel tap to a
fractional position; we bilinearly sample all K*K taps (a gather of rows from
the flattened feature map), modulate by the sigmoid mask, and reduce with ONE
(K*K*Cin) x Cout matmul on the MXU — i.e. deformable im2col where the gather
is the only non-matmul work, sharing machinery with the MSDA op.

Offset channel layout matches mmcv's kernel: per kernel tap k (row-major),
offset[..., 2k] = dy_k, offset[..., 2k+1] = dx_k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("kernel_size", "stride", "padding", "dilation"))
def modulated_deform_conv2d(x: jnp.ndarray,
                            offset: jnp.ndarray,
                            mask: jnp.ndarray,
                            weight: jnp.ndarray,
                            bias: jnp.ndarray = None,
                            kernel_size: Tuple[int, int] = (3, 3),
                            stride: int = 1,
                            padding: int = 1,
                            dilation: int = 1) -> jnp.ndarray:
    """NHWC modulated deformable conv.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, 2*Kh*Kw) — (dy, dx) interleaved per tap.
      mask: (B, Ho, Wo, Kh*Kw) — already sigmoid-ed modulation scalars.
      weight: (Kh*Kw*Cin, Cout) — tap-major (kernel position outer, Cin inner).
      bias: (Cout,) or None.
    """
    B, H, W, Cin = x.shape
    Kh, Kw = kernel_size
    K = Kh * Kw
    Ho, Wo = offset.shape[1], offset.shape[2]

    # Base sampling grid: output pixel (i, j), tap (u, v) samples input at
    # (i*stride - padding + u*dilation + dy, j*stride - padding + v*dilation + dx).
    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(Kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(Kw, dtype=jnp.float32) * dilation
    base_y = (oy[:, None, None, None] + ky[None, None, :, None])  # (Ho,1,Kh,1)
    base_x = (ox[None, :, None, None] + kx[None, None, None, :])  # (1,Wo,1,Kw)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, Kh, Kw))
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, Kh, Kw))

    off = offset.reshape(B, Ho, Wo, K, 2).astype(jnp.float32)
    sy = base_y.reshape(1, Ho, Wo, K) + off[..., 0]
    sx = base_x.reshape(1, Ho, Wo, K) + off[..., 1]

    # Bilinear sample with zero padding outside, via the corner-packed
    # layout: the TPU gather engine moves ~one row per fixed cost regardless
    # of row width (measured 7.7 ns/row at both 128 and 256 lanes), so
    # packing all four corners into one 4*Cin-wide row quarters gather time.
    valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
    yp = sy + 1.0
    xp = sx + 1.0
    y0 = jnp.floor(yp)
    x0 = jnp.floor(xp)
    ly = (yp - y0).astype(x.dtype)
    lx = (xp - x0).astype(x.dtype)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W)

    v = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))       # zero ring
    v4 = jnp.concatenate(
        [v[:, :-1, :-1], v[:, :-1, 1:], v[:, 1:, :-1], v[:, 1:, 1:]],
        axis=-1).reshape(B, (H + 1) * (W + 1), 4 * Cin)

    idx = (y0c * (W + 1) + x0c).reshape(B, -1)             # (B, N*K)
    rows = jnp.take_along_axis(v4, idx[:, :, None], axis=1)  # (B, N*K, 4*Cin)

    vmask = valid.reshape(B, -1, 1).astype(x.dtype)
    lyf = ly.reshape(B, -1, 1) * vmask
    lxf = lx.reshape(B, -1, 1)
    # slice-fma over the four packed corners — avoids materializing a
    # (B, N*K, 4, Cin) intermediate + reshape (measured ~140 ms at flagship
    # scale in the DCN stages alone)
    w00 = (vmask - lyf) * (1 - lxf)
    w01 = (vmask - lyf) * lxf
    w10 = lyf * (1 - lxf)
    w11 = lyf * lxf
    sampled = (rows[..., 0 * Cin:1 * Cin] * w00
               + rows[..., 1 * Cin:2 * Cin] * w01
               + rows[..., 2 * Cin:3 * Cin] * w10
               + rows[..., 3 * Cin:4 * Cin] * w11)         # (B, N*K, Cin)

    sampled = sampled.reshape(B, Ho, Wo, K, Cin) * mask[..., None].astype(x.dtype)
    cols = sampled.reshape(B, Ho, Wo, K * Cin)
    out = jnp.einsum("bhwk,kc->bhwc", cols, weight.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
