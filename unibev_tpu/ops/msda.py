"""Multi-scale deformable attention — TPU-native core op.

Exact semantics follow the reference's torch fallback
``multi_scale_deformable_attn_pytorch`` (invoked at /root/reference/projects/
UniBEV/unibev_plugin/models/modules/spatial_cross_attention_img.py:437-438),
which is the ground truth the CUDA kernel also matches:

  * sampling locations are in [0, 1] over each level's (W, H);
  * bilinear sampling uses grid_sample align_corners=False semantics, i.e.
    pixel coordinate = loc * size - 0.5, with zero padding outside;
  * output[q] = sum_{level, point} attn_w * bilinear(value_level, loc).

Design notes (TPU):
  * ``spatial_shapes`` is a static tuple of (H, W) so every reshape is
    shape-static under jit.
  * the inner gather runs per (batch*head) with flattened spatial indices; the
    four corner gathers are batched into ONE take_along_axis call (stacked
    corner axis) so XLA emits a single fused gather kernel.
  * ``query_chunk`` bounds peak memory for the 40k-query BEV self-attention
    case by mapping over query blocks with lax.map.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _msda_single_level(value: jnp.ndarray, H: int, W: int,
                       loc: jnp.ndarray, attn: jnp.ndarray) -> jnp.ndarray:
    """One level of deformable attention.

    value: (BH, H*W, D) — flattened per (batch*head) feature map.
    loc:   (BH, Q, P, 2) sampling locations in [0,1] (x, y order).
    attn:  (BH, Q, P) attention weights.
    Returns (BH, Q, D).
    """
    BH, _, D = value.shape
    Q, P = loc.shape[1], loc.shape[2]

    x = loc[..., 0] * W - 0.5   # (BH, Q, P) pixel coords
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return flat, inb

    f00, m00 = corner(x0i, y0i)
    f01, m01 = corner(x0i + 1, y0i)
    f10, m10 = corner(x0i, y0i + 1)
    f11, m11 = corner(x0i + 1, y0i + 1)

    w00 = (1 - lx) * (1 - ly) * m00
    w01 = lx * (1 - ly) * m01
    w10 = (1 - lx) * ly * m10
    w11 = lx * ly * m11

    # Fold the bilinear corner weights into the attention weights, then do a
    # single gather over the 4*P stacked corner-points.
    idx = jnp.stack([f00, f01, f10, f11], axis=2)          # (BH, Q, 4, P)
    w = jnp.stack([w00, w01, w10, w11], axis=2) * attn[:, :, None, :]
    idx = idx.reshape(BH, Q * 4 * P)
    w = w.reshape(BH, Q * 4 * P).astype(value.dtype)

    gathered = jnp.take_along_axis(value, idx[:, :, None], axis=1)  # (BH, Q*4P, D)
    out = (gathered * w[:, :, None]).reshape(BH, Q, 4 * P, D).sum(axis=2)
    return out


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "query_chunk"))
def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   query_chunk: int = 0) -> jnp.ndarray:
    """Multi-scale deformable attention.

    Args:
      value: (B, num_value, heads, dim) with num_value = sum_l H_l*W_l.
      spatial_shapes: static tuple of (H_l, W_l).
      sampling_locations: (B, Q, heads, levels, points, 2) in [0,1], xy order.
      attention_weights: (B, Q, heads, levels, points).
      query_chunk: if >0, process queries in chunks of this size to bound
        peak gather memory (must divide Q).

    Returns:
      (B, Q, heads * dim)
    """
    B, _, nh, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)

    # Split per-level value tensors, each flattened per (batch*head).
    level_sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in level_sizes:
        offsets.append(offsets[-1] + s)
    assert offsets[-1] == value.shape[1], (offsets, value.shape)

    # (B, V, H, D) -> (B, H, V, D) -> (B*H, V, D)
    value_bh = value.transpose(0, 2, 1, 3).reshape(B * nh, -1, D)
    # (B, Q, H, L, P, ·) -> (B*H, Q, L, P, ·)
    loc_bh = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(B * nh, Q, L, -1, 2)
    attn_bh = attention_weights.transpose(0, 2, 1, 3, 4).reshape(B * nh, Q, L, -1)

    def run(loc_bh, attn_bh):
        out = 0.0
        for l, (H, W) in enumerate(spatial_shapes):
            v_l = value_bh[:, offsets[l]:offsets[l + 1], :]
            out = out + _msda_single_level(v_l, H, W, loc_bh[:, :, l], attn_bh[:, :, l])
        return out

    if query_chunk and Q > query_chunk:
        n_chunks = -(-Q // query_chunk)
        Qp = n_chunks * query_chunk
        if Qp != Q:
            def pad_q(a):
                widths = [(0, 0)] * a.ndim
                widths[1] = (0, Qp - Q)
                return jnp.pad(a, widths)
            loc_bh, attn_bh = pad_q(loc_bh), pad_q(attn_bh)
        loc_c = loc_bh.reshape(B * nh, n_chunks, query_chunk, L, -1, 2).transpose(1, 0, 2, 3, 4, 5)
        attn_c = attn_bh.reshape(B * nh, n_chunks, query_chunk, L, -1).transpose(1, 0, 2, 3, 4)
        out = jax.lax.map(lambda args: run(*args), (loc_c, attn_c))
        out = out.transpose(1, 0, 2, 3).reshape(B * nh, Qp, D)[:, :Q]
    else:
        out = run(loc_bh, attn_bh)

    # (B*H, Q, D) -> (B, Q, H*D)
    return out.reshape(B, nh, Q, D).transpose(0, 2, 1, 3).reshape(B, Q, nh * D)
