"""Modulated deformable convolution (DCNv2) as bilinear-gather + matmul.

Replaces the mmcv DCNv2 CUDA op used in the reference image backbone's
stages 3-4 (config dcn=DCNv2 at /root/reference/projects/UniBEV/configs/
unibev/unibev_nus_LC_cnw_256_modality_dropout.py:235-236).

TPU shape of the computation: the learned offsets move each kernel tap to a
fractional position; we bilinearly sample all K*K taps, modulate by the
sigmoid mask, and reduce with ONE (K*K*Cin) x Cout matmul on the MXU — i.e.
deformable im2col where the gather is the only non-matmul work.

Fast path (bf16 inputs): all four bilinear corners of a tap are packed as
PAIRS of bf16 values inside s32 lanes — (x0,x1) at y0 in lanes [0,Cin),
(x0,x1) at y1 in lanes [Cin,2Cin) — because the v5e gather engine moves s32
rows at ~3.2 ns/row up to 512 lanes (measured; bf16 rows cost 4.7-6.7 ns).
Unpacking is free on the VPU: a bf16 is the top half of its f32 widening, so
lo = bitcast_f32(v << 16), hi = bitcast_f32(v & 0xFFFF0000).  The bilinear
reduction is separable (x-lerp inside each s32, then y-lerp across the two
halves) with mask and validity folded into the lerp weights, so nothing
wider than (rows, 2*Cin) is ever materialized.

The bit-level packing is not differentiable, so the op is a custom_vjp whose
backward is jax.vjp over the straightforward (clean) formulation — under the
backbone's remat the clean forward is recomputed in backward anyway.

Offset channel layout matches mmcv's kernel: per kernel tap k (row-major),
offset[..., 2k] = dy_k, offset[..., 2k+1] = dx_k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_geometry(x_shape, offset, kernel_size, stride, padding, dilation):
    """Shared sampling-position math: returns (sy, sx, valid) in f32."""
    B, H, W, Cin = x_shape
    Kh, Kw = kernel_size
    K = Kh * Kw
    Ho, Wo = offset.shape[1], offset.shape[2]

    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(Kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(Kw, dtype=jnp.float32) * dilation
    base_y = (oy[:, None, None, None] + ky[None, None, :, None])  # (Ho,1,Kh,1)
    base_x = (ox[None, :, None, None] + kx[None, None, None, :])  # (1,Wo,1,Kw)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, Kh, Kw))
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, Kh, Kw))

    off = offset.reshape(offset.shape[0], Ho, Wo, K, 2).astype(jnp.float32)
    sy = base_y.reshape(1, Ho, Wo, K) + off[..., 0]
    sx = base_x.reshape(1, Ho, Wo, K) + off[..., 1]
    valid = (sy > -1.0) & (sy < H) & (sx > -1.0) & (sx < W)
    return sy, sx, valid


def _mdcn_clean(x, offset, mask, weight, kernel_size, stride, padding,
                dilation):
    """Straightforward 4-corner formulation (any dtype; defines gradients)."""
    B, H, W, Cin = x.shape
    K = kernel_size[0] * kernel_size[1]
    Ho, Wo = offset.shape[1], offset.shape[2]

    sy, sx, valid = _sample_geometry(x.shape, offset, kernel_size, stride,
                                     padding, dilation)
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
    return jnp.einsum("bhwk,kc->bhwc", cols, weight.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _pack_pairs(a, b):
    """Pack two bf16 arrays into one s32 lane: a low 16 bits, b high."""
    au = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
    bu = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    return (au | (bu << 16)).astype(jnp.int32)


def _unpack_lo_f32(v):
    """Exact f32 value of the bf16 in the low 16 bits (bf16 = f32 top half)."""
    return jax.lax.bitcast_convert_type(v << 16, jnp.float32)


def _unpack_hi_f32(v):
    u = jax.lax.bitcast_convert_type(v, jnp.uint32) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _pack_table_flat(x):
    """(B, TR, 2Cin) s32 pair-packed 4-corner table, built FLAT.

    Cell t = y*(W+2) + x (y in [0,H], x in [0,W]) holds
    [pack(v[y,x], v[y,x+1]) | pack(v[y+1,x], v[y+1,x+1])] of the 1-padded
    map v — all four bilinear corners of a sample point in one gather row.
    Built from row-shifted slices of the FLAT padded map: the earlier
    (B,H,W,C)-shaped build made XLA assign the pack fusion a {3,1,2,0}
    layout and then pay a {3,2,1,0} relayout copy plus a materialized
    reshape per conv (~0.5 ms/block traced at the flagship stage-3 shape,
    23 DCN blocks).  Flat row slices keep every step in the gather's own
    2-D layout.  Cells at x == W+1 wrap into the next padded row — garbage,
    but never addressed (x0 is clipped to [0, W]).

    Returns (tab, TR, row_stride); build sample indices as
    y0*row_stride + x0.
    """
    B, H, W, Cin = x.shape
    s = W + 2
    L = (H + 2) * s
    TR = (H + 1) * s - 1
    vf = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(B, L, Cin)
    row_y0 = _pack_pairs(vf[:, :TR], vf[:, 1:TR + 1])
    row_y1 = _pack_pairs(vf[:, s:TR + s], vf[:, s + 1:])
    return jnp.concatenate([row_y0, row_y1], axis=-1), TR, s


def _mdcn_fast_impl(x, offset, mask, weight, kernel_size, stride, padding,
                    dilation):
    """s32 pair-packed corner gather + separable bilinear (bf16 x only)."""
    B, H, W, Cin = x.shape
    K = kernel_size[0] * kernel_size[1]
    Ho, Wo = offset.shape[1], offset.shape[2]

    sy, sx, valid = _sample_geometry(x.shape, offset, kernel_size, stride,
                                     padding, dilation)
    yp = sy + 1.0
    xp = sx + 1.0
    y0 = jnp.floor(yp)
    x0 = jnp.floor(xp)
    ly = yp - y0
    lx = xp - x0
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W)

    tab, TR, rstride = _pack_table_flat(x)                 # (B, TR, 2Cin)

    idx_b = (y0c * rstride + x0c).reshape(B, -1)           # (B, Ho*Wo*K)
    mf = (mask.astype(jnp.float32) * valid.astype(jnp.float32)).reshape(B, -1)
    lyf = ly.reshape(B, -1)
    lxf = lx.reshape(B, -1)

    w_flat = weight.astype(jnp.bfloat16)                   # (K*Cin, Cout)
    Cout = w_flat.shape[1]

    # Per-sample-group gathers: per-camera tables (12.2 MB at stage 3)
    # measured best.  Camera PAIRS (26e6 window) were tried after the
    # ops/msda.py head-grouping win and measured NEUTRAL here (LC 411.6 vs
    # 409.2 ms): the DCN already runs few, large per-camera fusions, so
    # there is no per-group overhead to amortize.
    bytes_per_b = TR * 2 * Cin * 4
    G = max(1, min(B, int(20e6 // max(bytes_per_b, 1))))
    while B % G:
        G -= 1
    offs = (jnp.arange(G, dtype=jnp.int32) * TR)[:, None]
    outs = []
    for g in range(0, B, G):
        t = tab[g:g + G].reshape(G * TR, 2 * Cin)
        fidx = (idx_b[g:g + G] + offs).reshape(-1)
        rows = t.at[fidx].get(mode="promise_in_bounds")    # (G*N*K, 2Cin)
        m = mf[g:g + G].reshape(-1, 1)
        lyg = lyf[g:g + G].reshape(-1, 1)
        lxg = lxf[g:g + G].reshape(-1, 1)
        wx0 = (1.0 - lxg) * m
        wx1 = lxg * m
        r0 = rows[:, :Cin]
        r1 = rows[:, Cin:]
        top = _unpack_lo_f32(r0) * wx0 + _unpack_hi_f32(r0) * wx1
        bot = _unpack_lo_f32(r1) * wx0 + _unpack_hi_f32(r1) * wx1
        sampled = (top * (1.0 - lyg) + bot * lyg).astype(jnp.bfloat16)
        out = jnp.dot(sampled.reshape(G * Ho * Wo, K * Cin), w_flat,
                      preferred_element_type=jnp.float32)
        outs.append(out)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)


def _mdcn_fp8_impl(x, offset, mask, weight, kernel_size, stride, padding,
                   dilation):
    """fp8(e4m3) QUAD-packed corner gather: all four bilinear corners of a
    tap in ONE s32 lane — (y0x0, y0x1, y1x0, y1x1) as bytes lo->hi.

    Halves both the gather row bytes (1 KB vs the bf16 pair path's 2 KB at
    Cin=256) and the table size vs the pair path, at an e4m3 quantization
    of the sampled VALUES only (offsets/weights/output stay bf16+f32).
    Config-gated: a numerics deviation from the bf16 path — see
    tests/test_deform_conv.py for the measured drift bound.
    """
    B, H, W, Cin = x.shape
    K = kernel_size[0] * kernel_size[1]
    Ho, Wo = offset.shape[1], offset.shape[2]

    sy, sx, valid = _sample_geometry(x.shape, offset, kernel_size, stride,
                                     padding, dilation)
    yp = sy + 1.0
    xp = sx + 1.0
    y0 = jnp.floor(yp)
    x0 = jnp.floor(xp)
    ly = yp - y0
    lx = xp - x0
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W)

    v8 = jax.lax.bitcast_convert_type(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(
            jnp.float8_e4m3fn), jnp.uint8).astype(jnp.uint32)
    q = (v8[:, :-1, :-1, :]
         | (v8[:, :-1, 1:, :] << 8)
         | (v8[:, 1:, :-1, :] << 16)
         | (v8[:, 1:, 1:, :] << 24)).astype(jnp.int32)
    TR = (H + 1) * (W + 1)
    tab = q.reshape(B, TR, Cin)

    idx_b = (y0c * (W + 1) + x0c).reshape(B, -1)           # (B, Ho*Wo*K)
    mf = (mask.astype(jnp.float32) * valid.astype(jnp.float32)).reshape(B, -1)
    lyf = ly.reshape(B, -1)
    lxf = lx.reshape(B, -1)

    w_flat = weight.astype(jnp.bfloat16)
    Cout = w_flat.shape[1]

    def u8f(u):
        b8 = (u & jnp.uint32(0xFF)).astype(jnp.uint8)
        return jax.lax.bitcast_convert_type(
            b8, jnp.float8_e4m3fn).astype(jnp.float32)

    bytes_per_b = TR * Cin * 4
    G = max(1, min(B, int(20e6 // max(bytes_per_b, 1))))
    while B % G:
        G -= 1
    offs = (jnp.arange(G, dtype=jnp.int32) * TR)[:, None]
    outs = []
    for g in range(0, B, G):
        t = tab[g:g + G].reshape(G * TR, Cin)
        fidx = (idx_b[g:g + G] + offs).reshape(-1)
        rows = jax.lax.bitcast_convert_type(
            t.at[fidx].get(mode="promise_in_bounds"), jnp.uint32)
        m = mf[g:g + G].reshape(-1, 1)
        lyg = lyf[g:g + G].reshape(-1, 1)
        lxg = lxf[g:g + G].reshape(-1, 1)
        wy0 = (1.0 - lyg) * m
        wy1 = lyg * m
        w00 = wy0 * (1.0 - lxg)
        w01 = wy0 * lxg
        w10 = wy1 * (1.0 - lxg)
        w11 = wy1 * lxg
        sampled = (u8f(rows) * w00
                   + u8f(rows >> 8) * w01
                   + u8f(rows >> 16) * w10
                   + u8f(rows >> 24) * w11).astype(jnp.bfloat16)
        out = jnp.dot(sampled.reshape(G * Ho * Wo, K * Cin), w_flat,
                      preferred_element_type=jnp.float32)
        outs.append(out)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _mdcn_fp8(x, offset, mask, weight, kernel_size, stride, padding,
              dilation):
    return _mdcn_fp8_impl(x, offset, mask, weight, kernel_size, stride,
                          padding, dilation)


def _mdcn_fp8_fwd(x, offset, mask, weight, kernel_size, stride, padding,
                  dilation):
    out = _mdcn_fp8_impl(x, offset, mask, weight, kernel_size, stride,
                         padding, dilation)
    return out, (x, offset, mask, weight)


# straight-through: gradients flow through the bf16 corner values (the
# quantizer's STE), reusing the pair path's hand-written backward.
_mdcn_fp8.defvjp(_mdcn_fp8_fwd, lambda *a: _mdcn_fast_bwd(*a))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _mdcn_fast(x, offset, mask, weight, kernel_size, stride, padding,
               dilation):
    return _mdcn_fast_impl(x, offset, mask, weight, kernel_size, stride,
                           padding, dilation)


def _mdcn_fast_fwd(x, offset, mask, weight, kernel_size, stride, padding,
                   dilation):
    out = _mdcn_fast_impl(x, offset, mask, weight, kernel_size, stride,
                          padding, dilation)
    return out, (x, offset, mask, weight)


def _mdcn_fast_bwd(kernel_size, stride, padding, dilation, res, g):
    """Hand-written backward: d_x via a SORTED corner scatter.

    Autodiff of the clean formulation scatter-adds 313k random rows per
    stage-3 conv (~10x the gather rate on TPU); argsorting the corner
    contributions by target row first lets the scatter run with
    indices_are_sorted=True.  d_offset/d_mask/d_weight come from the same
    recomputed gather (one extra pass, as remat would do anyway).
    """
    x, offset, mask, weight = res
    B, H, W, Cin = x.shape
    K = kernel_size[0] * kernel_size[1]
    Ho, Wo = offset.shape[1], offset.shape[2]
    N = Ho * Wo
    TR = (H + 1) * (W + 1)

    sy, sx, valid = _sample_geometry(x.shape, offset, kernel_size, stride,
                                     padding, dilation)
    yp = sy + 1.0
    xp = sx + 1.0
    y0 = jnp.floor(yp)
    x0 = jnp.floor(xp)
    ly = yp - y0                                            # (B, Ho, Wo, K)
    lx = xp - x0
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
    # scatter index (d_x accumulation target): dense (H+1, W+1) raster
    idx = (y0c * (W + 1) + x0c).reshape(B, N * K)

    # Re-gather through the SAME s32 pair-packed table as the forward: the
    # bf16 4-corner table this backward first used cost ~12 ms/conv to build
    # ((B,TR,4Cin) bf16 concat) and its 1024-lane bf16 gather rows moved at
    # the slow bf16 rate — the s32 pack is half the table-build traffic and
    # gathers at ~3.2 ns/row (same bytes per row, fewer+faster lanes).
    # Per-camera gathers keep each source table (~12 MB at stage 3) inside
    # the ~20 MB fast gather window; one batched take_along_axis over all
    # cameras reads a ~73 MB table at the slow-window rate instead.
    tab, TRg, rstride = _pack_table_flat(x)
    idx_g = (y0c * rstride + x0c).reshape(B, N * K)
    rows = jnp.concatenate(
        [tab[b].at[idx_g[b]].get(mode="promise_in_bounds") for b in range(B)],
        axis=0)
    M = B * N * K
    rows = rows.reshape(M, 2 * Cin)                   # s32 pairs, wide minor
    rp0 = rows[:, :Cin]                               # (x0,x1) at y0
    rp1 = rows[:, Cin:]                               # (x0,x1) at y1
    # corner values as exact f32 views of the packed bf16 halves; these feed
    # multi-output fusions (cdots / sampled) and never round-trip to HBM
    v00, v01 = _unpack_lo_f32(rp0), _unpack_hi_f32(rp0)
    v10, v11 = _unpack_lo_f32(rp1), _unpack_hi_f32(rp1)

    # per-sample scalars kept 1D (1D arrays tile lane-major: no padding)
    a = valid.astype(jnp.float32).reshape(M)
    lxf = lx.reshape(M).astype(jnp.float32)
    lyf = ly.reshape(M).astype(jnp.float32)
    u00 = (1 - lxf) * (1 - lyf) * a
    u01 = lxf * (1 - lyf) * a
    u10 = (1 - lxf) * lyf * a
    u11 = lxf * lyf * a

    gf = g.astype(x.dtype).reshape(B * N, -1)               # (BN, Cout)
    w_k = weight.reshape(K, Cin, -1).astype(x.dtype)

    # d_sampled (post-value adjoint per tap): (BN, K*Cin) wide
    ds = jnp.einsum("no,kco->nkc", gf, w_k,
                    preferred_element_type=jnp.float32).astype(
        x.dtype).reshape(B * N, K * Cin)
    mf = mask.astype(x.dtype).reshape(M)
    dsm = (ds.reshape(M, Cin) * mf[:, None])                # (M, Cin) bf16

    # sampled (pre-mask) slice-FMA for d_mask / d_weight
    sampled = (v00 * u00[:, None] + v01 * u01[:, None]
               + v10 * u10[:, None] + v11 * u11[:, None]).astype(x.dtype)
    d_mask = (ds.reshape(M, Cin) * sampled).sum(
        -1, dtype=jnp.float32).reshape(mask.shape)
    cols = (sampled * mf[:, None]).reshape(B * N, K * Cin)
    d_weight = jnp.einsum("nk,no->ko", cols, gf,
                          preferred_element_type=jnp.float32).astype(
        weight.dtype)

    def cdot(vc):
        return (vc * dsm).sum(-1, dtype=jnp.float32)  # (M,) f32-accumulated

    gv0, gv1, gv2, gv3 = cdot(v00), cdot(v01), cdot(v10), cdot(v11)
    d_sx = ((gv1 - gv0) * (1 - lyf) + (gv3 - gv2) * lyf) * a
    d_sy = ((gv2 - gv0) * (1 - lxf) + (gv3 - gv1) * lxf) * a
    d_offset = jnp.stack([d_sy.reshape(B, Ho, Wo, K),
                          d_sx.reshape(B, Ho, Wo, K)],
                         axis=-1).reshape(B, Ho, Wo, K * 2).astype(offset.dtype)

    # d_x via sorted corner scatter; contributions as ONE wide concat
    contrib = jnp.concatenate(
        [dsm * u00[:, None], dsm * u01[:, None],
         dsm * u10[:, None], dsm * u11[:, None]], axis=-1)  # (M, 4Cin)
    # unsorted bf16 scatter PER CAMERA: each (TR, 4Cin) target is ~12 MB so
    # the read-modify-write can stay on-chip; sorting measured slower (keys
    # follow the output raster already)
    contrib_b = contrib.astype(x.dtype).reshape(B, N * K, 4 * Cin)
    idx_bb = idx.reshape(B, N * K)
    parts = [jnp.zeros((TR, 4 * Cin), x.dtype).at[idx_bb[b]].add(contrib_b[b])
             for b in range(B)]
    d_v4 = jnp.stack(parts, axis=0).reshape(B, H + 1, W + 1, 4 * Cin)

    def corner(c, py, px):
        t = d_v4[..., c * Cin:(c + 1) * Cin]
        return jnp.pad(t, ((0, 0), py, px, (0, 0)))

    d_x = (corner(0, (0, 1), (0, 1)) + corner(1, (0, 1), (1, 0))
           + corner(2, (1, 0), (0, 1)) + corner(3, (1, 0), (1, 0))
           )[:, 1:H + 1, 1:W + 1, :].astype(x.dtype)
    return d_x, d_offset, d_mask.astype(mask.dtype), d_weight


_mdcn_fast.defvjp(_mdcn_fast_fwd, _mdcn_fast_bwd)


@functools.partial(jax.jit, static_argnames=("kernel_size", "stride",
                                             "padding", "dilation",
                                             "table_dtype"))
def modulated_deform_conv2d(x: jnp.ndarray,
                            offset: jnp.ndarray,
                            mask: jnp.ndarray,
                            weight: jnp.ndarray,
                            bias: jnp.ndarray = None,
                            kernel_size: Tuple[int, int] = (3, 3),
                            stride: int = 1,
                            padding: int = 1,
                            dilation: int = 1,
                            table_dtype: str = "bf16") -> jnp.ndarray:
    """NHWC modulated deformable conv.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, 2*Kh*Kw) — (dy, dx) interleaved per tap.
      mask: (B, Ho, Wo, Kh*Kw) — already sigmoid-ed modulation scalars.
      weight: (Kh*Kw*Cin, Cout) — tap-major (kernel position outer, Cin inner).
      bias: (Cout,) or None.
      table_dtype: 'bf16' (pair-packed, exact) | 'fp8' (quad-packed e4m3
        gather table: half the gather bytes, value-quantized — config-gated).
    """
    if x.dtype == jnp.bfloat16 and table_dtype == "fp8":
        out = _mdcn_fp8(x, offset, mask, weight, kernel_size, stride,
                        padding, dilation)
    elif x.dtype == jnp.bfloat16:
        out = _mdcn_fast(x, offset, mask, weight, kernel_size, stride,
                         padding, dilation)
    else:
        out = _mdcn_clean(x, offset, mask, weight, kernel_size, stride,
                          padding, dilation)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
