"""Pallas TPU kernel: deformable attention over SMALL value maps via
in-VMEM one-hot build + MXU matmul.

Motivation (measured on v5e): XLA's gather engine sustains only ~32 GB/s
(~one 128-lane row per few cycles), capping every gather-based MSDA
formulation.  For the camera SCA the per-camera value map is tiny
(29x50 = 1450 rows), so the sampling operator can be materialized as a dense
(q_tile, V) matrix IN VMEM — built with K fused compare-selects on the VPU —
and applied as ONE MXU matmul.  Nothing but inputs/outputs touches HBM.

Semantics are exactly ``ms_deform_attn`` (grid_sample align_corners=False,
zero padding) for a single level, exposed as ``ms_deform_attn_smallv``.

STATUS: RETIRED from the production path (round 2).  The one-hot build is
VPU compare-bound; XLA grouped corner-packed gathers (ops/msda.py) measured
3x faster in-model, and SpatialCrossAttentionImg now routes there
(models/attention/deformable.py).  Kept as a working, oracle-tested Pallas
reference kernel for small-value-map attention (tests/test_msda.py) — the
pattern is the right one if a future geometry shrinks the per-camera maps.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _onehot_matmul_kernel(idx_ref, w_ref, value_ref, out_ref, *, K: int):
    """idx: (1, Qt, K) int32; w: (1, Qt, K) f32; value: (1, V, D);
    out: (1, Qt, D)."""
    Qt = idx_ref.shape[1]
    V = value_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (Qt, V), 1)
    acc = jnp.zeros((Qt, V), jnp.float32)
    for k in range(K):
        idx_k = idx_ref[0, :, k][:, None]
        w_k = w_ref[0, :, k][:, None]
        acc = acc + jnp.where(idx_k == iota, w_k, 0.0)
    out_ref[0] = jnp.dot(
        acc.astype(value_ref.dtype), value_ref[0],
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _corner_rolled_kernel(idx_ref, w_ref, value_ref, out_ref, *, P: int,
                          row_stride: int):
    """One compare per POINT, four weighted accumulators, roll-aligned.

    idx: (1, Qt, P) int32 — top-left corner index in the zero-ring-padded
    row-major layout (stride row_stride = W + 1).
    w:   (1, Qt, 4*P) f32 — per-corner weights [w00, w01, w10, w11] x P.
    The +1 / +row_stride corner offsets become lane ROLLS of the accumulator
    (wrap-around rows carry zero weight by construction of the padding).
    """
    Qt = idx_ref.shape[1]
    V = value_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (Qt, V), 1)
    a00 = jnp.zeros((Qt, V), jnp.float32)
    a01 = jnp.zeros((Qt, V), jnp.float32)
    a10 = jnp.zeros((Qt, V), jnp.float32)
    a11 = jnp.zeros((Qt, V), jnp.float32)
    for p in range(P):
        m = (idx_ref[0, :, p][:, None] == iota).astype(jnp.float32)
        a00 = a00 + w_ref[0, :, 4 * p + 0][:, None] * m
        a01 = a01 + w_ref[0, :, 4 * p + 1][:, None] * m
        a10 = a10 + w_ref[0, :, 4 * p + 2][:, None] * m
        a11 = a11 + w_ref[0, :, 4 * p + 3][:, None] * m
    acc = (a00
           + pltpu.roll(a01, 1, 1)
           + pltpu.roll(a10, row_stride, 1)
           + pltpu.roll(a11, row_stride + 1, 1))
    out_ref[0] = jnp.dot(
        acc.astype(value_ref.dtype), value_ref[0],
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _smallv_reference(value, spatial_shape, sampling_locations,
                      attention_weights):
    """Differentiable jnp twin (single level, heads folded) — backward pass."""
    from unibev_tpu.ops.msda import _slab_level
    H, W = spatial_shape
    return _slab_level(value, H, W, sampling_locations, attention_weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6))
def _smallv_op(value, spatial_shape, sampling_locations, attention_weights,
               q_tile, interpret, variant):
    return _smallv_impl(value, spatial_shape, sampling_locations,
                        attention_weights, q_tile, interpret, variant)


def _smallv_fwd(value, spatial_shape, loc, attn, q_tile, interpret, variant):
    out = _smallv_impl(value, spatial_shape, loc, attn, q_tile, interpret,
                       variant)
    return out, (value, loc, attn)


def _smallv_bwd(spatial_shape, q_tile, interpret, variant, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(
        lambda v, l, a: _smallv_reference(v, spatial_shape, l, a),
        value, loc, attn)
    return vjp(g)


_smallv_op.defvjp(_smallv_fwd, _smallv_bwd)


@functools.partial(jax.jit,
                   static_argnames=("spatial_shape", "q_tile", "interpret",
                                    "variant"))
def ms_deform_attn_smallv(value: jnp.ndarray,
                          spatial_shape: Tuple[int, int],
                          sampling_locations: jnp.ndarray,
                          attention_weights: jnp.ndarray,
                          q_tile: int = 256,
                          interpret: bool = False,
                          variant: str = "corner") -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, jnp-gather backward."""
    return _smallv_op(value, spatial_shape, sampling_locations,
                      attention_weights, q_tile, interpret, variant)


def _smallv_impl(value: jnp.ndarray,
                 spatial_shape: Tuple[int, int],
                 sampling_locations: jnp.ndarray,
                 attention_weights: jnp.ndarray,
                 q_tile: int = 256,
                 interpret: bool = False,
                 variant: str = "corner") -> jnp.ndarray:
    """Single-level deformable attention for small value maps.

    Args:
      value: (BH, V, D) per batch*head value rows, V = H*W (small, <= ~4k).
      spatial_shape: (H, W).
      sampling_locations: (BH, Q, P, 2) in [0,1] (x, y).
      attention_weights: (BH, Q, P).
      variant: 'corner' (1 compare/point + rolls, ~2.5x less VPU work) or
        'onehot' (1 compare per corner).
    Returns:
      (BH, Q, D)
    """
    BH, V, D = value.shape
    Q, P = sampling_locations.shape[1], sampling_locations.shape[2]
    H, W = spatial_shape
    assert V == H * W, (V, H, W)

    x = sampling_locations[..., 0] * W - 0.5
    y = sampling_locations[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    Qp = _round_up(Q, q_tile)
    Dp = _round_up(D, 128)

    if variant == "corner":
        # zero-ring-padded layout, one top-left index per point
        stride = W + 2
        valid = ((x > -1.0) & (x < W) & (y > -1.0) & (y < H)).astype(jnp.float32)
        x0c = jnp.clip(x0i + 1, 0, W)
        y0c = jnp.clip(y0i + 1, 0, H)
        idx = (y0c * stride + x0c).astype(jnp.int32)           # (BH, Q, P)
        aw = (attention_weights * valid).astype(jnp.float32)
        w4 = jnp.stack([(1 - ly) * (1 - lx) * aw, (1 - ly) * lx * aw,
                        ly * (1 - lx) * aw, ly * lx * aw],
                       axis=-1).reshape(BH, Q, 4 * P).astype(jnp.float32)
        Vpad = (H + 2) * (W + 2)
        Vp = _round_up(Vpad, 128)
        vp = jnp.pad(value.reshape(BH, H, W, D),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        vp = vp.reshape(BH, Vpad, D)
        value_p = jnp.pad(vp, ((0, 0), (0, Vp - Vpad), (0, Dp - D)))
        if Qp != Q:
            idx = jnp.pad(idx, ((0, 0), (0, Qp - Q), (0, 0)))
            w4 = jnp.pad(w4, ((0, 0), (0, Qp - Q), (0, 0)))
        kernel = functools.partial(_corner_rolled_kernel, P=P,
                                   row_stride=stride)
        idx_in, w_in, Kw = idx, w4, 4 * P
    else:
        K = 4 * P
        idxs, ws = [], []
        for dy, wy in ((0, 1 - ly), (1, ly)):
            for dx, wx in ((0, 1 - lx), (1, lx)):
                xi = x0i + dx
                yi = y0i + dy
                inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                idxs.append(jnp.where(inb, yi * W + xi, -1))
                ws.append(wy * wx * inb * attention_weights)
        idx_in = jnp.stack(idxs, axis=-1).reshape(BH, Q, K)
        w_in = jnp.stack(ws, axis=-1).reshape(BH, Q, K).astype(jnp.float32)
        Vp = _round_up(V, 128)
        value_p = jnp.pad(value, ((0, 0), (0, Vp - V), (0, Dp - D)))
        if Qp != Q:
            idx_in = jnp.pad(idx_in, ((0, 0), (0, Qp - Q), (0, 0)),
                             constant_values=-1)
            w_in = jnp.pad(w_in, ((0, 0), (0, Qp - Q), (0, 0)))
        kernel = functools.partial(_onehot_matmul_kernel, K=K)
        Kw = K

    grid = (BH, Qp // q_tile)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, Qp, Dp), value.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, idx_in.shape[-1]), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, Kw), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Dp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, Dp), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_in, w_in, value_p)
    return out[:, :Q, :D]
