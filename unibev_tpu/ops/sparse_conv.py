"""Sparse 3D convolution primitives for the SECOND-style middle encoder.

The reference relies on spconv/mmcv SparseEncoder CUDA kernels (config
pts_middle_encoder at /root/reference/projects/UniBEV/configs/unibev/
unibev_nus_LC_cnw_256_modality_dropout.py:194-208, sparse_shape
[41, 1440, 1440]).  On TPU there is no sparse tensor support, so we keep a
fixed-capacity active-voxel set and turn every conv into
``gather (im2col over 27 taps) -> one MXU matmul``:

  * a dense int32 index table per (batch, resolution) maps flat voxel
    coordinates -> row index in the feature array (sentinel V = "empty",
    pointing at an all-zero padding row);
  * for submanifold convs the (V, 27) neighbor-index table is computed ONCE
    per resolution and reused by every subm conv at that resolution (the
    active set does not change), so per-conv cost is one gather + matmul;
  * strided SparseConv3d reproduces spconv's exact output-site semantics:
    every site whose kernel window covers >=1 input site becomes active
    (candidate generation + sort-unique with fixed capacity).

All shapes static; validity carried in masks.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _tap_offsets(kernel: Tuple[int, int, int],
                 base: Tuple[int, int, int] = (0, 0, 0)) -> np.ndarray:
    """(K, 3) static (dz, dy, dx) tap offsets, row-major, dx fastest."""
    kz, ky, kx = kernel
    bz, by, bx = base
    return np.array([(dz + bz, dy + by, dx + bx)
                     for dz in range(kz) for dy in range(ky)
                     for dx in range(kx)], np.int32)


def _div_nonneg(v: jnp.ndarray, s: int) -> jnp.ndarray:
    """v // s for v guaranteed >= 0 — ONE HLO op (shift or trunc divide).

    jnp.floor_divide on signed ints emits a ~14-op sign-correction chain
    PER CALL SITE; unrolled over 27 taps x 3 axes that was ~half the sparse
    encoder's op count (and most of the multichip dryrun's CPU compile time).
    """
    if s == 1:
        return v
    if s & (s - 1) == 0:
        return jax.lax.shift_right_logical(v, int(s).bit_length() - 1)
    return jax.lax.div(v, jnp.int32(s))


def _rem_nonneg(v: jnp.ndarray, s: int) -> jnp.ndarray:
    """v % s for v >= 0 — one HLO op."""
    if s == 1:
        return jnp.zeros_like(v)
    if s & (s - 1) == 0:
        return jax.lax.bitwise_and(v, jnp.int32(s - 1))
    return jax.lax.rem(v, jnp.int32(s))


class SparseGrid(NamedTuple):
    """Active voxel set at one resolution (batch folded into coords)."""
    coords: jnp.ndarray   # (V, 4) int32: (b, z, y, x); -1 rows are padding
    mask: jnp.ndarray     # (V,) bool
    shape: Tuple[int, int, int]  # (D, H, W)
    batch: int


class PackedTable(NamedTuple):
    """Dense flat-coord -> row-index table in a gather-ready dual layout.

    ``rows`` holds TWO (r0, 128) views of the same logical 1-D table, the
    second shifted 64 lanes.  Any aligned 3-cell x-window [f-1, f+1] fits
    entirely inside one 128-lane row of at least one layout (a 3-wide window
    cannot cross both a 128-aligned and a 64-shifted boundary), so all three
    x-neighbors of a cell cost ONE gather row instead of three — the gather
    engine charges per row regardless of width (tools/microbench.py).  The
    logical cells live at offset _LEAD of layout 0; both layouts carry
    sentinel padding on each side so clipped window reads stay in bounds.
    """
    rows: jnp.ndarray     # (2*r0, 128) int32; [0:r0] aligned, [r0:] +64
    r0: int
    size: int             # logical cell count
    sentinel: int


_LEAD = 64   # sentinel cells before logical cell 0 in the packed buffer


def _pack_table(table1d: jnp.ndarray, sentinel: int) -> PackedTable:
    size = table1d.shape[0]
    r0 = -(-(size + _LEAD) // 128) + 1
    buflen = r0 * 128 + _LEAD
    buf = jnp.concatenate([
        jnp.full((_LEAD,), sentinel, jnp.int32),
        table1d.astype(jnp.int32),
        jnp.full((buflen - _LEAD - size,), sentinel, jnp.int32)])
    rows = jnp.concatenate([buf[:r0 * 128].reshape(r0, 128),
                            buf[_LEAD:].reshape(r0, 128)], axis=0)
    return PackedTable(rows, r0, size, sentinel)


def table_entries(pt: PackedTable) -> jnp.ndarray:
    """Logical 1-D view (size,) — for tests/debugging."""
    return pt.rows[:pt.r0].reshape(-1)[_LEAD:_LEAD + pt.size]


def table_occupancy(pt: PackedTable) -> jnp.ndarray:
    """(size,) bool: cell active (one elementwise pass, no scatter)."""
    return table_entries(pt) != pt.sentinel


def window3_lookup(pt: PackedTable, flat: jnp.ndarray):
    """(left, center, right) = table[flat-1], table[flat], table[flat+1].

    ``flat`` must be clipped to [0, size); out-of-range neighbors are the
    CALLER's job to mask (cell 0's "left" reads the sentinel lead).  One
    gather row per query: layout 0 when the window doesn't straddle its
    row boundary, the 64-shifted layout otherwise.
    """
    p = flat + (_LEAD - 1)                      # cell index of the LEFT tap
    lane0 = p & 127
    use0 = lane0 <= 125
    row = jnp.where(use0, p >> 7, pt.r0 + ((p - 64) >> 7))
    lane = jnp.where(use0, lane0, lane0 - 64)
    rows = pt.rows.at[row].get(mode="promise_in_bounds")     # (N, 128)
    d = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) - lane[:, None]
    zero = jnp.zeros_like(rows)
    # ONE stacked reduction (3, N): three separate lane-select reduces each
    # re-read the materialized (N, 128) rows buffer — 553 MB at the res-0
    # shape, 4x the useful bytes; a single multi-output fusion lets the
    # gather fuse into its only consumer and writes just the three dense
    # (N,) outputs.
    lcr = jnp.stack([jnp.where(d == 0, rows, zero).sum(axis=1),
                     jnp.where(d == 1, rows, zero).sum(axis=1),
                     jnp.where(d == 2, rows, zero).sum(axis=1)])
    return lcr[0], lcr[1], lcr[2]


def _flat_index(coords: jnp.ndarray, mask: jnp.ndarray,
                shape: Tuple[int, int, int], trash: int) -> jnp.ndarray:
    D, H, W = shape
    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    flat = ((b * D + z) * H + y) * W + x
    return jnp.where(mask, flat, trash)


def build_table(grid: SparseGrid) -> PackedTable:
    """Dense flat-coord -> row-index lookup table, sentinel V for empty."""
    D, H, W = grid.shape
    V = grid.coords.shape[0]
    size = grid.batch * D * H * W
    r0 = -(-(size + _LEAD) // 128) + 1
    buflen = r0 * 128 + _LEAD
    flat = _flat_index(grid.coords, grid.mask, grid.shape, buflen - _LEAD - 1)
    buf = jnp.full((buflen,), V, jnp.int32)
    # trash writes land in the tail sentinel slack, beyond any window read
    buf = buf.at[flat + _LEAD].set(jnp.arange(V, dtype=jnp.int32), mode="drop")
    rows = jnp.concatenate([buf[:r0 * 128].reshape(r0, 128),
                            buf[_LEAD:].reshape(r0, 128)], axis=0)
    return PackedTable(rows, r0, size, V)


def subm_neighbor_idx(grid: SparseGrid, table: PackedTable,
                      kernel: Tuple[int, int, int] = (3, 3, 3)) -> jnp.ndarray:
    """(V, K) row indices of each active voxel's kernel-window neighbors.

    Out-of-grid / empty neighbors get index V (the zero padding row).
    Tap order is (dz, dy, dx) row-major — the weight layout contract.

    The kx==3 taps of each (dz, dy) plane are x-adjacent in the flat table,
    so the whole plane costs ONE window3 gather row: 9 rows per voxel
    instead of 27 (the per-resolution neighbor build was the single
    hottest block of the flagship middle encoder).
    """
    D, H, W = grid.shape
    V = grid.coords.shape[0]
    kz, ky, kx = kernel
    assert kx == 3, kernel

    b = grid.coords[:, 0:1]
    offs = _tap_offsets((kz, ky, 1), (-(kz // 2), -(ky // 2), 0))
    nz = grid.coords[:, 1:2] + offs[None, :, 0]
    ny = grid.coords[:, 2:3] + offs[None, :, 1]
    x = grid.coords[:, 3:4]
    plane_ok = (grid.mask[:, None] & (nz >= 0) & (nz < D)
                & (ny >= 0) & (ny < H))
    flat = ((b * D + nz) * H + ny) * W + x
    flat = jnp.clip(jnp.where(plane_ok, flat, 0), 0, table.size - 1)
    left, cent, right = window3_lookup(table, flat.reshape(-1))
    P = offs.shape[0]
    left = jnp.where(plane_ok & (x > 0), left.reshape(-1, P), V)
    cent = jnp.where(plane_ok, cent.reshape(-1, P), V)
    right = jnp.where(plane_ok & (x < W - 1), right.reshape(-1, P), V)
    return jnp.stack([left, cent, right], axis=-1).reshape(
        -1, P * 3).astype(jnp.int32)


class XPairPlan(NamedTuple):
    """Precomputed x-pair gather plan for a 3-wide-x kernel (kx == 3).

    The 27 narrow per-tap rows of an im2col gather are the sparse encoder's
    dominant cost (measured 6-23 ms per conv on v5e).  Packing each voxel's
    feature with its x-successor into one s32 lane (pack2[c] = (f[c],
    f[x+1 of c])) lets each (dz, dy) plane's x-triple (cl, cm, cr) be fetched
    with TWO wide rows instead of three narrow ones — and the pack table is
    only 2x the feature bytes, staying inside the gather engine's fast
    window at every stage (quad-packing fell off it at stage 1+):

      case0 cl active:           A = pack2[cl] -> (t_l, t_m) = (A.lo, A.hi);
                                 t_r = B.lo
      case1 cl empty, cm active: A = pack2[cm] -> (t_l, t_m, t_r) =
                                 (0, A.lo, A.hi)
      case2 cl and cm empty:     (0, 0, B.lo)
      (B = pack2[cr] always; empty anchors hit the zero padding row.)

    Exact for every emptiness pattern: A.hi is the x-successor LOOKUP of the
    anchor, which resolves (or zeroes) independently of the pattern.
    Measured 3.3-6.9x faster than the 27-row gather at every stage shape
    (tools/microbench.py subm27 vs subm18).
    """
    anchorA: jnp.ndarray   # (Vout, 9) row in pack table (V = zero row)
    anchorB: jnp.ndarray   # (Vout, 9)
    case: jnp.ndarray      # (Vout, 9) in {0, 1, 2}
    xp1: jnp.ndarray       # (Vin,) x-successor row of every input voxel


def make_xpair_plan(neighbor_idx: jnp.ndarray, xp1: jnp.ndarray,
                    n_rows: int) -> XPairPlan:
    """Derive the plan from a (Vout, 27|3k) tap table with dx fastest.

    neighbor_idx tap order must be (dz, dy, dx) row-major with kx == 3
    (subm_neighbor_idx / strided_neighbor_idx contract); n_rows = Vin (the
    empty sentinel).
    """
    Vout, K = neighbor_idx.shape
    assert K % 3 == 0, K
    t = neighbor_idx.reshape(Vout, K // 3, 3)
    cl, cm, cr = t[..., 0], t[..., 1], t[..., 2]
    cl_ok = cl < n_rows
    cm_ok = cm < n_rows
    case = jnp.where(cl_ok, 0, jnp.where(cm_ok, 1, 2)).astype(jnp.int32)
    anchorA = jnp.where(cl_ok, cl, cm).astype(jnp.int32)
    return XPairPlan(anchorA, cr.astype(jnp.int32), case,
                     xp1.astype(jnp.int32))


def _pack_pairs_s32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    au = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
    bu = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
    return (au | (bu << 16)).astype(jnp.int32)


def _unpack_lo(v):
    return jax.lax.bitcast_convert_type(v << 16, jnp.float32)


def _unpack_hi(v):
    u = jax.lax.bitcast_convert_type(v, jnp.uint32) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def xpair_cols(feats: jnp.ndarray, plan: XPairPlan) -> jnp.ndarray:
    """im2col columns (Vout, K*Cin) via pair-packed x-triple gathers.

    Column order is X-POSITION MAJOR — (dx, plane, cin) — NOT the weight's
    tap-major (plane, dx, cin) order; pair it with ``xpair_weight``.  The
    reorder lets every elementwise op run on wide 2D (V, P*Cin) arrays and
    the final concat stay coalesced: the naive per-plane stack materialized
    (V, 9, 1, Cin) tensors whose (1, Cin<128) minor tiles pad 14-64x on TPU
    (measured: the whole x-pair win disappeared into layout copies).
    bf16 feats only.
    """
    V, Cin = feats.shape
    Vout, P = plan.anchorA.shape
    fpad = jnp.concatenate([feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
    fp1 = fpad.at[plan.xp1].get(mode="promise_in_bounds")
    tab = _pack_pairs_s32(feats, fp1)
    tab = jnp.concatenate([tab, jnp.zeros((1, Cin), jnp.int32)], axis=0)
    A = tab.at[plan.anchorA.reshape(-1)].get(
        mode="promise_in_bounds").reshape(Vout, P * Cin)
    B = tab.at[plan.anchorB.reshape(-1)].get(
        mode="promise_in_bounds").reshape(Vout, P * Cin)
    alo = _unpack_lo(A).astype(feats.dtype)
    ahi = _unpack_hi(A).astype(feats.dtype)
    blo = _unpack_lo(B).astype(feats.dtype)
    m0 = jnp.broadcast_to((plan.case == 0)[:, :, None],
                          (Vout, P, Cin)).reshape(Vout, P * Cin)
    m1 = jnp.broadcast_to((plan.case == 1)[:, :, None],
                          (Vout, P, Cin)).reshape(Vout, P * Cin)
    zero = jnp.zeros_like(alo)
    tl = jnp.where(m0, alo, zero)
    tm = jnp.where(m0, ahi, jnp.where(m1, alo, zero))
    tr = jnp.where(m0, blo, jnp.where(m1, ahi, blo))
    return jnp.concatenate([tl, tm, tr], axis=-1)   # (Vout, 3*P*Cin)


def xpair_weight(weight: jnp.ndarray, P: int, Cin: int) -> jnp.ndarray:
    """Permute a tap-major (plane, dx, cin) weight to xpair_cols' x-major
    (dx, plane, cin) column order."""
    Cout = weight.shape[1]
    return weight.reshape(P, 3, Cin, Cout).transpose(1, 0, 2, 3).reshape(
        3 * P * Cin, Cout)


def gather_conv(feats: jnp.ndarray, neighbor_idx: jnp.ndarray,
                weight: jnp.ndarray, out_mask: jnp.ndarray) -> jnp.ndarray:
    """im2col sparse conv: gather neighbors, one matmul.

    feats: (V, Cin); neighbor_idx: (Vout, K) into rows of feats (V = zero);
    weight: (K * Cin, Cout) tap-major; out_mask: (Vout,).
    """
    V, Cin = feats.shape
    Vout, K = neighbor_idx.shape
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
    cols = jnp.take(feats_pad, neighbor_idx.reshape(-1), axis=0)
    cols = cols.reshape(Vout, K * Cin)
    out = jnp.dot(cols, weight.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return jnp.where(out_mask[:, None], out, 0.0)


@jax.custom_vjp
def subm_gather_conv(feats: jnp.ndarray, neighbor_idx: jnp.ndarray,
                     weight: jnp.ndarray, out_mask: jnp.ndarray) -> jnp.ndarray:
    """gather_conv specialized to SUBMANIFOLD convs with a gather-only VJP.

    For an odd symmetric kernel on an unchanged active set, "j is tap k's
    neighbor of i" iff "i is tap (K-1-k)'s neighbor of j", so d_feats can be
    GATHERED through the reversed-tap neighbor table instead of scatter-added
    — TPU scatters measured ~10x slower than gathers at the same row count
    (this halved the flagship backward's sparse-conv cost).
    """
    return gather_conv(feats, neighbor_idx, weight, out_mask)


def _subm_gc_fwd(feats, neighbor_idx, weight, out_mask):
    return subm_gather_conv(feats, neighbor_idx, weight, out_mask), \
        (feats, neighbor_idx, weight, out_mask)


def _mirror_transpose_weight(weight: jnp.ndarray, K: int,
                             Cin: int) -> jnp.ndarray:
    """(K*Cin, Cout) tap-major -> (K*Cout, Cin): taps reversed, per-tap
    transpose — the weight of the conv that computes d_feats."""
    Cout = weight.shape[1]
    return weight.reshape(K, Cin, Cout)[::-1].transpose(0, 2, 1).reshape(
        K * Cout, Cin)



def _dw_dot(cols, g):
    """Weight grad cols^T @ g as ONE bf16 MXU contraction over the voxel
    axis (f32 accumulate).  The explicit `cols.T.astype(f32)` form it
    replaces materialized a (V, K*Cin) f32 transpose per conv in the train
    backward (~200 MB at the stage-0 shape); contracting dim 0 directly
    keeps the operands bf16 and lets the MXU accumulate in f32 — the same
    numerics plain autodiff of the bf16 forward would produce."""
    return jax.lax.dot_general(
        cols, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _subm_gc_bwd(res, g):
    """d_feats of a submanifold conv IS a submanifold conv: for an odd
    symmetric kernel on an unchanged active set, "j is tap k's neighbor of
    i" iff "i is tap (K-1-k)'s neighbor of j", so
    d_feats = subm_conv(d_out, W[::-1]^T) — which reuses the SAME optimized
    forward (the old per-tap mirror-gather materialized (V*27, Cin<128)
    narrow intermediates that padded 8x and dominated the train step)."""
    feats, neighbor_idx, weight, out_mask = res
    V, Cin = feats.shape
    Vout, K = neighbor_idx.shape
    g = jnp.where(out_mask[:, None], g, 0.0).astype(feats.dtype)

    w_t = _mirror_transpose_weight(weight, K, Cin).astype(feats.dtype)
    d_feats = gather_conv(g, neighbor_idx, w_t, out_mask)

    feats_pad = jnp.concatenate([feats, jnp.zeros((1, Cin), feats.dtype)],
                                axis=0)
    cols = jnp.take(feats_pad, neighbor_idx.reshape(-1), axis=0).reshape(
        Vout, K * Cin)
    d_weight = _dw_dot(cols, g).astype(weight.dtype)
    return d_feats, None, d_weight, None


subm_gather_conv.defvjp(_subm_gc_fwd, _subm_gc_bwd)


# -------------------------------------------------- fp8 x-quad fast path

class XQuadPlan(NamedTuple):
    """Single-anchor x-window gather plan over an fp8 TRIPLE-packed table.

    pack[c] holds fp8(f[cell x]), fp8(f[cell x+1]), fp8(f[cell x+2]) in one
    s32 lane (byte 3 unused), where the +1/+2 cells are DIRECT grid lookups
    (zero row when empty).  Unlike the bf16 pair scheme, every emptiness
    pattern of an x-triple (cl, cm, cr) then needs only ONE anchor row:

      case0 cl active:  A = pack[cl] -> (A.b0, A.b1, A.b2)
      case1 cm active:  A = pack[cm] -> (0,    A.b0, A.b1)
      case2 cr active:  A = pack[cr] -> (0,    0,    A.b0)

    Half the gather rows of the pair path at the same table bytes
    (4 B/channel), at an e4m3 quantization of the VALUES — config-gated.
    """
    anchor: jnp.ndarray    # (Vout, P) row in pack table (V = zero row)
    case: jnp.ndarray      # (Vout, P) in {0, 1, 2}
    xp1: jnp.ndarray       # (Vin,) row of each voxel's x+1 grid cell
    xp2: jnp.ndarray       # (Vin,) row of each voxel's x+2 grid cell


def make_xquad_plan(neighbor_idx: jnp.ndarray, grid: SparseGrid,
                    table: PackedTable) -> XQuadPlan:
    """Derive the plan from a (Vout, 3k) dx-fastest tap table + the input
    grid (for the direct x+1 / x+2 successor lookups)."""
    Vout, K = neighbor_idx.shape
    assert K % 3 == 0, K
    n_rows = grid.coords.shape[0]
    t = neighbor_idx.reshape(Vout, K // 3, 3)
    cl, cm, cr = t[..., 0], t[..., 1], t[..., 2]
    cl_ok = cl < n_rows
    cm_ok = cm < n_rows
    case = jnp.where(cl_ok, 0, jnp.where(cm_ok, 1, 2)).astype(jnp.int32)
    anchor = jnp.where(cl_ok, cl, jnp.where(cm_ok, cm, cr)).astype(jnp.int32)

    D, H, W = grid.shape
    b, z, y, x = (grid.coords[:, 0], grid.coords[:, 1], grid.coords[:, 2],
                  grid.coords[:, 3])
    cell1 = ((b * D + z) * H + y) * W + jnp.clip(x + 1, 0, W - 1)
    cell1 = jnp.clip(jnp.where(grid.mask, cell1, 0), 0, table.size - 1)
    l1, c1, r1 = window3_lookup(table, cell1)   # cells x, x+1, x+2
    xp1 = jnp.where(grid.mask & (x + 1 < W), c1, n_rows).astype(jnp.int32)
    xp2 = jnp.where(grid.mask & (x + 2 < W), r1, n_rows).astype(jnp.int32)
    return XQuadPlan(anchor, case, xp1, xp2)


def _pack_fp8_triple(feats: jnp.ndarray, xp1, xp2) -> jnp.ndarray:
    """(V+1, C) s32 packed table (last row zeros) from bf16 feats."""
    V, C = feats.shape
    f8 = jax.lax.bitcast_convert_type(
        feats.astype(jnp.float8_e4m3fn), jnp.uint8).astype(jnp.uint32)
    f8p = jnp.concatenate([f8, jnp.zeros((1, C), jnp.uint32)], axis=0)
    q = (f8 | (f8p.at[xp1].get(mode="promise_in_bounds") << 8)
         | (f8p.at[xp2].get(mode="promise_in_bounds") << 16))
    return jnp.concatenate([q, jnp.zeros((1, C), jnp.uint32)],
                           axis=0).astype(jnp.int32)


def xquad_cols(feats: jnp.ndarray, plan: XQuadPlan) -> jnp.ndarray:
    """im2col columns (Vout, K*Cin) in the x-major (dx, plane, cin) order of
    ``xpair_cols`` — fp8-quantized values, ONE gather row per plane."""
    V, Cin = feats.shape
    Vout, P = plan.anchor.shape
    tab = _pack_fp8_triple(feats, plan.xp1, plan.xp2)
    A = jax.lax.bitcast_convert_type(
        tab.at[plan.anchor.reshape(-1)].get(
            mode="promise_in_bounds").reshape(Vout, P * Cin), jnp.uint32)

    def b2f(u):
        v8 = (u & jnp.uint32(0xFF)).astype(jnp.uint8)
        return jax.lax.bitcast_convert_type(
            v8, jnp.float8_e4m3fn).astype(feats.dtype)

    m0 = jnp.broadcast_to((plan.case == 0)[:, :, None],
                          (Vout, P, Cin)).reshape(Vout, P * Cin)
    m1 = jnp.broadcast_to((plan.case == 1)[:, :, None],
                          (Vout, P, Cin)).reshape(Vout, P * Cin)
    # select on the PACKED words (shift so the wanted byte is byte 0), then
    # ONE unpack pass
    zero = jnp.zeros_like(A)
    tl_p = jnp.where(m0, A, zero)
    tm_p = jnp.where(m0, A >> 8, jnp.where(m1, A, zero))
    tr_p = jnp.where(m0, A >> 16, jnp.where(m1, A >> 8, A))
    packed = jnp.concatenate([tl_p, tm_p, tr_p], axis=-1)
    return b2f(packed)                           # (Vout, 3*P*Cin)


def _pack_bf16_triple(feats: jnp.ndarray, xp1, xp2) -> jnp.ndarray:
    """(V+1, 2C) s32 table: lanes [0,C) = pack(f[x], f[x+1]), lanes [C,2C)
    = pack(f[x+2], f[x+1]).  4x the feats bytes (vs 2x for the pair table),
    but ONE anchor row per 3-tap x-window — half the pair path's gather
    rows, bit-exact bf16 values (unlike the e4m3 fp8 triple).  f[x+1] rides
    in BOTH words so xquad16_cols' case algebra stays lane-local (the B
    half-lane can serve tr for case0 AND case1 without a lane shuffle)."""
    V, C = feats.shape
    fpad = jnp.concatenate([feats, jnp.zeros((1, C), feats.dtype)], axis=0)
    fp1 = fpad.at[xp1].get(mode="promise_in_bounds")
    fp2 = fpad.at[xp2].get(mode="promise_in_bounds")
    a = _pack_pairs_s32(feats, fp1)
    b = _pack_pairs_s32(fp2, fp1)
    tab = jnp.concatenate([a, b], axis=-1)
    return jnp.concatenate([tab, jnp.zeros((1, 2 * C), jnp.int32)], axis=0)


def xquad16_cols(feats: jnp.ndarray, plan: XQuadPlan) -> jnp.ndarray:
    """im2col columns (Vout, 4*P*Cin) via the bf16 triple-packed
    single-anchor gather — pair with ``xquad16_weight``.

    Column order is NOT xpair_cols' x-major: the earlier x-major variant
    sliced the gathered (Vout, P, 2Cin) rows into per-word halves, a
    minor-dim split XLA lowered as a full relayout (trace: 2.4 ms reshape +
    1.6 ms {0,2,1} copy PER CONV at stage 0 — more than the gather itself).
    Here every op runs directly on the gathered (Vout, P*2Cin) layout:
    block A holds [tl | tr] per plane and block B [tm | 0], all selects
    lane-local given the (f0,f1|f2,f1) pack; only the rare case-2 tr
    (cl AND cm empty) reads across lanes, via ONE minor-axis roll that XLA
    fuses as two slices.  The matmul K grows 3PC -> 4PC in zero columns —
    microscopic next to the relayout it removes."""
    V, Cin = feats.shape
    Vout, P = plan.anchor.shape
    tab = _pack_bf16_triple(feats, plan.xp1, plan.xp2)
    G = tab.at[plan.anchor.reshape(-1)].get(
        mode="promise_in_bounds").reshape(Vout, P * 2 * Cin)
    lo = _unpack_lo(G).astype(feats.dtype)     # per plane: [f0 | f2]
    hi = _unpack_hi(G).astype(feats.dtype)     # per plane: [f1 | f1]
    # case2's tr = f0[anchor], held in the A half-lane: shift it into the B
    # half-lane position (plane-local: lane p*2C+C+c reads p*2C+c)
    lo_s = _unpack_lo(jnp.roll(G, Cin, axis=1)).astype(feats.dtype)
    m0 = jnp.broadcast_to((plan.case == 0)[:, :, None],
                          (Vout, P, 2 * Cin)).reshape(Vout, P * 2 * Cin)
    m1 = jnp.broadcast_to((plan.case == 1)[:, :, None],
                          (Vout, P, 2 * Cin)).reshape(Vout, P * 2 * Cin)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P * 2 * Cin), 1)
    upper = (lane % (2 * Cin)) >= Cin          # B half-lane of each plane
    zero = jnp.zeros_like(lo)
    # A block: lower half tl = m0 ? f0 : 0; upper half tr = m0 ? f2
    #          : m1 ? f1 : f0[anchor]
    blkA = jnp.where(m0, lo,
                     jnp.where(upper, jnp.where(m1, hi, lo_s), zero))
    # B block: lower half tm = m0 ? f1 : m1 ? f0 : 0; upper half zeros
    blkB = jnp.where(upper, zero,
                     jnp.where(m0, hi, jnp.where(m1, lo, zero)))
    return jnp.concatenate([blkA, blkB], axis=-1)   # (Vout, 4*P*Cin)


def xquad16_weight(weight: jnp.ndarray, P: int, Cin: int) -> jnp.ndarray:
    """Permute a tap-major (plane, dx, cin) weight to xquad16_cols' block
    order: [per plane (tl, tr)] ++ [per plane (tm, zeros)]."""
    Cout = weight.shape[1]
    w = weight.reshape(P, 3, Cin, Cout)
    z = jnp.zeros((P, 1, Cin, Cout), weight.dtype)
    blkA = w[:, (0, 2)].reshape(P * 2 * Cin, Cout)
    blkB = jnp.concatenate([w[:, 1:2], z], axis=1).reshape(P * 2 * Cin, Cout)
    return jnp.concatenate([blkA, blkB], axis=0)    # (4*P*Cin, Cout)


@jax.custom_vjp
def subm_xquad16_conv(feats, neighbor_idx, qplan, pplan, weight, out_mask):
    """Submanifold conv with the bf16 x-quad forward (bit-exact values);
    backward through the x-pair path like subm_xpair_conv."""
    cols = xquad16_cols(feats, qplan)
    w = xquad16_weight(weight, qplan.anchor.shape[1], feats.shape[1])
    out = jnp.dot(cols, w.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return jnp.where(out_mask[:, None], out, 0.0)


def _subm_xq16_fwd(feats, neighbor_idx, qplan, pplan, weight, out_mask):
    return subm_xquad16_conv(feats, neighbor_idx, qplan, pplan, weight,
                             out_mask), \
        (feats, neighbor_idx, pplan, weight, out_mask)


def _subm_xq16_bwd(res, g):
    d_feats, _, _, d_weight, _ = _subm_xp_bwd(res, g)
    return d_feats, None, None, None, d_weight, None


subm_xquad16_conv.defvjp(_subm_xq16_fwd, _subm_xq16_bwd)


@jax.custom_vjp
def strided_xquad16_conv(feats, neighbor_idx, qplan, pplan, inv_idx, weight,
                         out_mask):
    """Strided conv with the bf16 x-quad forward; backward through the
    x-pair / inverse-table path like strided_xpair_conv."""
    cols = xquad16_cols(feats, qplan)
    w = xquad16_weight(weight, qplan.anchor.shape[1], feats.shape[1])
    out = jnp.dot(cols, w.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return jnp.where(out_mask[:, None], out, 0.0)


def _strided_xq16_fwd(feats, neighbor_idx, qplan, pplan, inv_idx, weight,
                      out_mask):
    return strided_xquad16_conv(feats, neighbor_idx, qplan, pplan, inv_idx,
                                weight, out_mask), \
        (feats, neighbor_idx, pplan, inv_idx, weight, out_mask)


def _strided_xq16_bwd(res, g):
    d_feats, _, _, _, d_weight, _ = _strided_xp_bwd(res, g)
    return d_feats, None, None, None, None, d_weight, None


strided_xquad16_conv.defvjp(_strided_xq16_fwd, _strided_xq16_bwd)


@jax.custom_vjp
def subm_xquad_conv(feats, neighbor_idx, qplan, pplan, weight, out_mask):
    """Submanifold conv with the fp8 x-quad forward; gradients flow through
    the exact bf16 pair path (straight-through on the value quantizer)."""
    cols = xquad_cols(feats, qplan)
    w = xpair_weight(weight, qplan.anchor.shape[1], feats.shape[1])
    out = jnp.dot(cols, w.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return jnp.where(out_mask[:, None], out, 0.0)


def _subm_xq_fwd(feats, neighbor_idx, qplan, pplan, weight, out_mask):
    return subm_xquad_conv(feats, neighbor_idx, qplan, pplan, weight,
                           out_mask), \
        (feats, neighbor_idx, pplan, weight, out_mask)


def _subm_xq_bwd(res, g):
    d_feats, _, _, d_weight, _ = _subm_xp_bwd(res, g)
    return d_feats, None, None, None, d_weight, None


subm_xquad_conv.defvjp(_subm_xq_fwd, _subm_xq_bwd)


@jax.custom_vjp
def strided_xquad_conv(feats, neighbor_idx, qplan, pplan, inv_idx, weight,
                       out_mask):
    """Strided conv with the fp8 x-quad forward; backward through the exact
    bf16 pair path / inverse-table gather (straight-through quantizer)."""
    cols = xquad_cols(feats, qplan)
    w = xpair_weight(weight, qplan.anchor.shape[1], feats.shape[1])
    out = jnp.dot(cols, w.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return jnp.where(out_mask[:, None], out, 0.0)


def _strided_xq_fwd(feats, neighbor_idx, qplan, pplan, inv_idx, weight,
                    out_mask):
    return strided_xquad_conv(feats, neighbor_idx, qplan, pplan, inv_idx,
                              weight, out_mask), \
        (feats, neighbor_idx, pplan, inv_idx, weight, out_mask)


def _strided_xq_bwd(res, g):
    d_feats, _, _, _, d_weight, _ = _strided_xp_bwd(res, g)
    return d_feats, None, None, None, None, d_weight, None


strided_xquad_conv.defvjp(_strided_xq_fwd, _strided_xq_bwd)

@jax.custom_vjp
def subm_xpair_conv(feats, neighbor_idx, plan, weight, out_mask):
    """subm_gather_conv with the x-pair forward (bf16) and the SAME
    gather-only mirrored-tap backward."""
    cols = xpair_cols(feats, plan)
    w = xpair_weight(weight, plan.anchorA.shape[1], feats.shape[1])
    out = jnp.dot(cols, w.astype(feats.dtype),
                  preferred_element_type=jnp.float32).astype(feats.dtype)
    return jnp.where(out_mask[:, None], out, 0.0)


def _subm_xp_fwd(feats, neighbor_idx, plan, weight, out_mask):
    return subm_xpair_conv(feats, neighbor_idx, plan, weight, out_mask), \
        (feats, neighbor_idx, plan, weight, out_mask)


def _subm_xp_bwd(res, g):
    """Both backward products run through the x-pair fast path: d_feats is
    the mirrored-transposed subm conv over d_out (same neighbor table ->
    same plan), and d_weight's im2col is the same xpair_cols gather (with
    the x-major permutation inverted on the result)."""
    feats, neighbor_idx, plan, weight, out_mask = res
    V, Cin = feats.shape
    K = neighbor_idx.shape[1]
    P = K // 3
    Cout = weight.shape[1]
    g = jnp.where(out_mask[:, None], g, 0.0).astype(feats.dtype)

    w_t = _mirror_transpose_weight(weight, K, Cin).astype(feats.dtype)
    d_feats = jnp.dot(xpair_cols(g, plan),
                      xpair_weight(w_t, P, Cout).astype(g.dtype),
                      preferred_element_type=jnp.float32).astype(feats.dtype)
    d_feats = jnp.where(out_mask[:, None], d_feats, 0.0)

    cols_x = xpair_cols(feats, plan)                       # (V, K*Cin) x-major
    dw_x = _dw_dot(cols_x, g)
    d_weight = dw_x.reshape(3, P, Cin, Cout).transpose(1, 0, 2, 3).reshape(
        K * Cin, Cout).astype(weight.dtype)
    return d_feats, None, None, d_weight, None


subm_xpair_conv.defvjp(_subm_xp_fwd, _subm_xp_bwd)


def inverse_strided_idx(coords_in, mask_in, out_table: PackedTable,
                        kernel, stride, padding, out_shape, out_capacity):
    """(Vin, K) OUTPUT-row indices feeding each input voxel's gradient.

    For a strided conv, input i contributes to output o at tap d iff
    i = o*s - p + d, i.e. o = (i + p - d) / s — UNIQUE per tap when the
    division is exact.  That makes d_feats another GATHER-conv (over the
    output rows, with per-tap-transposed weights) instead of the ~10x
    slower scatter.  Sentinel = ``out_capacity`` (the zero padding row),
    passed explicitly: deriving it as max(out_table) silently corrupts
    d_feats if the output table ever saturates (max becomes capacity-1,
    a REAL row).

    For kx==3, sx==2 the three x-tap candidates per (dz, dy) plane collapse
    to the two adjacent cells {m-1, m} (m = (x+px)//2 in output coords), so
    the plane costs one window3 gather row: 9 rows per voxel instead of 27.
    """
    Do, Ho, Wo = out_shape
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding
    b = coords_in[:, 0:1]
    # v = i + p - d can be as low as -(k-1); shift by k*s (a multiple of the
    # stride, so quotient shifts by exactly k and remainder is unchanged)
    # to stay nonnegative and use 1-op trunc div/rem instead of jnp.divmod's
    # ~28-op signed floor chain per tap per axis.
    dz = jnp.arange(kz, dtype=jnp.int32)
    dy = jnp.arange(ky, dtype=jnp.int32)
    dx = jnp.arange(kx, dtype=jnp.int32)
    vz = coords_in[:, 1:2] + (pz + kz * sz) - dz[None, :]
    vy = coords_in[:, 2:3] + (py + ky * sy) - dy[None, :]
    vx = coords_in[:, 3:4] + (px + kx * sx) - dx[None, :]
    qz = _div_nonneg(vz, sz) - kz                           # (V, kz)
    qy = _div_nonneg(vy, sy) - ky                           # (V, ky)
    qx = _div_nonneg(vx, sx) - kx                           # (V, kx)
    okz = (_rem_nonneg(vz, sz) == 0) & (qz >= 0) & (qz < Do)
    oky = (_rem_nonneg(vy, sy) == 0) & (qy >= 0) & (qy < Ho)
    okx = (_rem_nonneg(vx, sx) == 0) & (qx >= 0) & (qx < Wo)

    assert kx == 1 or sx == 2, (kernel, stride)  # window covers <=2 x cells
    # plane cell at the window CENTER c = clip of the largest x candidate
    # (tap dx=0); every valid x tap hits c or c-1.
    c = jnp.clip(qx[:, 0], 0, Wo - 1)
    qzp = qz[:, :, None]                                    # (V, kz, 1)
    qyp = qy[:, None, :]                                    # (V, 1, ky)
    plane_ok = (mask_in[:, None, None] & okz[:, :, None] & oky[:, None, :])
    mcell = ((b[:, :, None] * Do + qzp) * Ho + qyp) * Wo \
        + c[:, None, None]                                  # (V, kz, ky)
    mcell = jnp.clip(jnp.where(plane_ok, mcell, 0), 0, out_table.size - 1)
    left, cent, _ = window3_lookup(out_table, mcell.reshape(-1))
    P = kz * ky
    left = left.reshape(-1, P)
    cent = cent.reshape(-1, P)
    # per-tap select: tap dx hits cell qx[dx]; == c -> center, c-1 -> left
    sel_c = (qx == c[:, None])                              # (V, kx)
    sel_l = (qx == c[:, None] - 1)
    val = jnp.where(sel_c[:, None, :], cent[:, :, None],
                    left[:, :, None])                       # (V, P, kx)
    ok = (plane_ok.reshape(-1, P)[:, :, None]
          & (okx & (sel_c | sel_l))[:, None, :])
    return jnp.where(ok, val, out_capacity).reshape(
        -1, P * kx).astype(jnp.int32)


@jax.custom_vjp
def strided_xpair_conv(feats, neighbor_idx, plan, inv_idx, weight, out_mask):
    """Strided conv: x-pair forward when a plan is given; backward via the
    inverse-table gather-conv when inv_idx is given (NO scatter), else the
    vjp of the clean formulation."""
    if plan is not None:
        cols = xpair_cols(feats, plan)
        w = xpair_weight(weight, plan.anchorA.shape[1], feats.shape[1])
        out = jnp.dot(cols, w.astype(feats.dtype),
                      preferred_element_type=jnp.float32).astype(feats.dtype)
        return jnp.where(out_mask[:, None], out, 0.0)
    return gather_conv(feats, neighbor_idx, weight, out_mask)


def _strided_xp_fwd(feats, neighbor_idx, plan, inv_idx, weight, out_mask):
    return strided_xpair_conv(feats, neighbor_idx, plan, inv_idx, weight,
                              out_mask), \
        (feats, neighbor_idx, plan, inv_idx, weight, out_mask)


def _strided_xp_bwd(res, g):
    feats, neighbor_idx, plan, inv_idx, weight, out_mask = res
    V, Cin = feats.shape
    K = neighbor_idx.shape[1]
    Cout = weight.shape[1]
    g = jnp.where(out_mask[:, None], g, 0.0).astype(feats.dtype)

    if inv_idx is not None:
        w_inv = weight.reshape(K, Cin, Cout).transpose(0, 2, 1).reshape(
            K * Cout, Cin).astype(feats.dtype)
        d_feats = gather_conv(g, inv_idx, w_inv, jnp.ones((V,), bool))
    else:
        _, vjp = jax.vjp(
            lambda f: gather_conv(f, neighbor_idx, weight, out_mask), feats)
        d_feats, = vjp(g)

    if plan is not None:
        P = K // 3
        cols_x = xpair_cols(feats, plan)
        dw_x = _dw_dot(cols_x, g)
        d_weight = dw_x.reshape(3, P, Cin, Cout).transpose(
            1, 0, 2, 3).reshape(K * Cin, Cout).astype(weight.dtype)
    else:
        feats_pad = jnp.concatenate(
            [feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
        cols = jnp.take(feats_pad, neighbor_idx.reshape(-1), axis=0).reshape(
            -1, K * Cin)
        d_weight = _dw_dot(cols, g).astype(weight.dtype)
    return d_feats, None, None, None, d_weight, None


strided_xpair_conv.defvjp(_strided_xp_fwd, _strided_xp_bwd)


# The v5e gather engine drops from ~3.3 to ~12+ ns/row once the source table
# exceeds roughly this size (tools/microbench.py gather/subm benches) — for
# RANDOM indices.  MSDA/DCN's deformable gathers are spatially local enough
# to dodge that cliff (round-4 head-pairing lever), but the sparse-conv
# im2col gathers are NOT: raising the window so the bit-exact bf16 x-quad
# engages at stages 1-3 measured SLOWER in-model both before the quad16
# relayout fix (48e6: LC 432.4 vs 412.5) and after it (90e6: 417.1 vs
# 400.5) — the cliff, not the relayout, is the cost.  The 20 MB window is
# the measured optimum for these call sites (UNIBEV_GATHER_WINDOW
# overrides for experiments).
_FAST_GATHER_TABLE_BYTES = float(
    os.environ.get("UNIBEV_GATHER_WINDOW", 20e6))


def best_gather_conv(feats, neighbor_idx, weight, out_mask, plan=None,
                     subm=False, inv_idx=None, qplan=None,
                     quad_dtype="fp8"):
    """Dispatch: x-quad when a quad plan exists (half the gather rows) —
    fp8 (value-quantized, config-gated) at the pair-table window, or bf16
    (bit-exact) while its 4x-feats table still fits the fast window; else
    the x-pair fast path when a pair plan exists, feats are bf16, and the
    pair table fits the window (stage 3's 20.5 MB table measured SLOWER
    through x-pair than the plain 27-row gather).  For strided convs,
    inv_idx routes the backward through the inverse-table gather instead
    of a scatter."""
    pack_bytes = feats.shape[0] * feats.shape[1] * 4
    in_window = pack_bytes <= _FAST_GATHER_TABLE_BYTES
    quadable = (qplan is not None and plan is not None
                and feats.dtype == jnp.bfloat16
                and neighbor_idx.shape[1] % 3 == 0)
    # Prefer the bf16 x-quad whenever its 2x-pack table fits the window:
    # SAME anchor-row count as the fp8 quad (rows cost per-row, not
    # per-byte) but bit-exact and without the fp8 table build — traced
    # 2.8 ms/conv of e4m3 convert passes at the stage-0 shape, more than
    # the gather+matmul combined.  fp8 only pays off where the 2x table
    # falls off the window (stages 1-2).
    use_quad16 = quadable and 2 * pack_bytes <= _FAST_GATHER_TABLE_BYTES
    use_quad8 = (quadable and not use_quad16
                 and quad_dtype == "fp8" and in_window)
    use_pair = (plan is not None and feats.dtype == jnp.bfloat16
                and in_window and neighbor_idx.shape[1] % 3 == 0)
    if subm:
        if use_quad8:
            return subm_xquad_conv(feats, neighbor_idx, qplan, plan, weight,
                                   out_mask)
        if use_quad16:
            return subm_xquad16_conv(feats, neighbor_idx, qplan, plan,
                                     weight, out_mask)
        if use_pair:
            return subm_xpair_conv(feats, neighbor_idx, plan, weight, out_mask)
        return subm_gather_conv(feats, neighbor_idx, weight, out_mask)
    if use_quad8 and inv_idx is not None:
        return strided_xquad_conv(feats, neighbor_idx, qplan, plan, inv_idx,
                                  weight, out_mask)
    if use_quad16 and inv_idx is not None:
        return strided_xquad16_conv(feats, neighbor_idx, qplan, plan,
                                    inv_idx, weight, out_mask)
    if use_pair or inv_idx is not None:
        return strided_xpair_conv(feats, neighbor_idx,
                                  plan if use_pair else None, inv_idx,
                                  weight, out_mask)
    return gather_conv(feats, neighbor_idx, weight, out_mask)


def downsample_with_table(coords: jnp.ndarray, mask: jnp.ndarray,
                          kernel: Tuple[int, int, int],
                          stride: Tuple[int, int, int],
                          padding: Tuple[int, int, int],
                          out_shape: Tuple[int, int, int],
                          capacity: int,
                          batch: int,
                          in_shape: Tuple[int, int, int] = None,
                          table_in: PackedTable = None):
    """spconv output-site generation via dense occupancy pooling.

    Output site o is active iff its kernel window covers >= 1 input site —
    i.e. the strided OR-pool of the input occupancy bitmap.  Scatter-free
    except (when no input table is given) one V-row bitmap build: TPU
    scatters run ~10x slower than gathers per row, and the previous
    candidate-scatter variant paid ~8 scatter rows per input voxel per
    stage.  The compact sorted coordinate list comes out of the prefix-sum
    blocks by binary search (rank -> block -> lane), costing O(capacity)
    fast-window gather rows instead of another candidate scatter.

    When ``table_in`` covers the input grid (in_shape/batch), occupancy is
    derived from it elementwise — no scatter at all.

    Returns (coords_out, mask_out, table: PackedTable, overflow_count).
    """
    Do, Ho, Wo = out_shape
    size = batch * Do * Ho * Wo

    if table_in is not None:
        assert in_shape is not None
        D, H, W = in_shape
        assert table_in.size == batch * D * H * W, (table_in.size, in_shape)
        occ = table_occupancy(table_in)
    else:
        assert in_shape is not None, "need in_shape to pool occupancy"
        D, H, W = in_shape
        in_size = batch * D * H * W
        flat_in = _flat_index(coords, mask, (D, H, W), in_size)
        occ = jnp.zeros((in_size + 1,), jnp.bool_).at[flat_in].set(
            True, mode="drop")[:-1]

    pooled = jax.lax.reduce_window(
        occ.reshape(batch, D, H, W).astype(jnp.int8), jnp.int8(0),
        jax.lax.max,
        window_dimensions=(1,) + tuple(kernel),
        window_strides=(1,) + tuple(stride),
        padding=((0, 0),) + tuple((p, p) for p in padding))
    assert pooled.shape == (batch, Do, Ho, Wo), (pooled.shape, out_shape)
    bitmap = pooled.reshape(-1) > 0

    # Two-level block scan: within-block inclusive counts via one MXU
    # matmul (XLA's native cumsum lowers to ~log N full passes over the
    # 10M+-element grid), block offsets via a tiny cumsum.
    block = 512
    nb = -(-size // block)
    xpad = jnp.pad(bitmap.astype(jnp.float32), (0, nb * block - size))
    tri = jnp.tril(jnp.ones((block, block), jnp.float32))
    within = jax.lax.dot_general(
        xpad.reshape(nb, block), tri, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (nb, block) incl.
    block_tot = within[:, -1]
    boff = (jnp.cumsum(block_tot) - block_tot).astype(jnp.int32)  # exclusive
    total = (boff[-1] + block_tot[-1].astype(jnp.int32))

    csum = (within + boff[:, None]).reshape(-1)[:size].astype(jnp.int32)
    rank = csum - 1
    table1d = jnp.where(bitmap & (rank < capacity), rank,
                        capacity).astype(jnp.int32)
    table = _pack_table(table1d, capacity)

    # rank -> flat coord: find each rank's block, then the first lane of
    # that block whose inclusive count equals the local rank + 1.  Block
    # lookup is scatter-max of block ids at their start ranks + a cummax
    # (jnp.searchsorted lowered to a 19 ms while-loop on the timeline; this
    # is one tiny nb-row scatter + a capacity-length scan).  For empty
    # blocks sharing a start rank the max block id wins, which is exactly
    # "last block with boff <= r".
    ranks = jnp.arange(capacity, dtype=jnp.int32)
    starts = jnp.zeros((capacity,), jnp.int32).at[boff].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    blk = jax.lax.associative_scan(jnp.maximum, starts)
    blk = jnp.clip(blk, 0, nb - 1)
    local = ranks - boff[blk]
    wrows = within.astype(jnp.int16).at[blk].get(
        mode="promise_in_bounds")                        # (capacity, block)
    lane = jnp.argmax(wrows == (local + 1)[:, None].astype(jnp.int16),
                      axis=1).astype(jnp.int32)
    flat_idx = blk * block + lane

    n_out = jnp.minimum(total, capacity)
    mask_out = ranks < n_out
    flat_idx = jnp.where(mask_out, flat_idx, 0)
    ob = _div_nonneg(flat_idx, Do * Ho * Wo)
    oz = _rem_nonneg(_div_nonneg(flat_idx, Ho * Wo), Do)
    oy = _rem_nonneg(_div_nonneg(flat_idx, Wo), Ho)
    ox = _rem_nonneg(flat_idx, Wo)
    coords_out = jnp.stack([ob, oz, oy, ox], axis=1).astype(jnp.int32)
    coords_out = jnp.where(mask_out[:, None], coords_out, -1)
    overflow = jnp.maximum(total - capacity, 0)
    # table sentinel must equal the ROW capacity used by gather_conv (V ==
    # capacity), pointing at the zero padding row.
    return coords_out, mask_out, table, overflow


def downsample_active_set(coords: jnp.ndarray, mask: jnp.ndarray,
                          kernel: Tuple[int, int, int],
                          stride: Tuple[int, int, int],
                          padding: Tuple[int, int, int],
                          out_shape: Tuple[int, int, int],
                          capacity: int,
                          batch: int):
    """spconv output-site generation for a strided SparseConv3d.

    Output site o (per axis) is active iff an input i exists with
    o*s - p <= i <= o*s - p + k - 1, i.e. o in
    [ceil((i + p - k + 1)/s), floor((i + p)/s)].  For k=3, s=2 each input
    contributes at most 2 sites per axis -> 8 candidates per voxel.
    Returns (coords_out (capacity, 4), mask_out, overflow_count).
    """
    Do, Ho, Wo = out_shape
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding

    def axis_candidates(i, p, k, s, size):
        v = i + (p + k * s)             # nonneg (see downsample_with_table)
        lo = _div_nonneg(v - k + 1 + (s - 1), s) - k   # ceil division
        hi = _div_nonneg(v, s) - k
        lo = jnp.maximum(lo, 0)
        hi = jnp.minimum(hi, size - 1)
        n = max(1, -(-k // s))          # max candidates per axis (static)
        offs = jnp.arange(n, dtype=jnp.int32)
        cand = lo[:, None] + offs[None, :]
        ok = cand <= hi[:, None]
        return cand, ok, n

    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    cz, okz, nz = axis_candidates(z, pz, kz, sz, Do)
    cy, oky, ny = axis_candidates(y, py, ky, sy, Ho)
    cx, okx, nx = axis_candidates(x, px, kx, sx, Wo)

    V = coords.shape[0]
    # (V, nz, ny, nx) cross product of axis candidates.
    zz = cz[:, :, None, None]
    yy = cy[:, None, :, None]
    xx = cx[:, None, None, :]
    ok = (okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
          & mask[:, None, None, None])
    bb = jnp.broadcast_to(b[:, None, None, None], ok.shape)
    flat = ((bb * Do + zz) * Ho + yy) * Wo + xx
    big = batch * Do * Ho * Wo
    flat = jnp.where(ok, flat, big).reshape(-1)

    skey = jnp.sort(flat)
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first &= skey < big
    uid = jnp.cumsum(first.astype(jnp.int32)) - 1
    keep = first & (uid < capacity)
    seg = jnp.where(keep, uid, capacity)
    ukey = jax.ops.segment_max(jnp.where(keep, skey, 0), seg,
                               num_segments=capacity + 1)[:-1]
    out_mask = jax.ops.segment_sum(keep.astype(jnp.int32), seg,
                                   num_segments=capacity + 1)[:-1] > 0
    ob = _div_nonneg(ukey, Do * Ho * Wo)
    oz = _rem_nonneg(_div_nonneg(ukey, Ho * Wo), Do)
    oy = _rem_nonneg(_div_nonneg(ukey, Wo), Ho)
    ox = _rem_nonneg(ukey, Wo)
    coords_out = jnp.stack([ob, oz, oy, ox], axis=1).astype(jnp.int32)
    coords_out = jnp.where(out_mask[:, None], coords_out, -1)
    total_sites = jnp.sum(first.astype(jnp.int32))
    overflow = jnp.maximum(total_sites - capacity, 0)
    return coords_out, out_mask, overflow


def strided_neighbor_idx(grid_in: SparseGrid, table_in: PackedTable,
                         coords_out: jnp.ndarray, out_mask: jnp.ndarray,
                         kernel: Tuple[int, int, int],
                         stride: Tuple[int, int, int],
                         padding: Tuple[int, int, int]) -> jnp.ndarray:
    """(Vout, K) input-row indices for each output site of a strided conv.

    Output site o, tap (dz,dy,dx) reads input i = o*s - p + (dz,dy,dx).
    For kx==3 the three x taps are adjacent input cells, so each (dz, dy)
    plane costs one window3 gather row (9 rows per site instead of 27).
    """
    D, H, W = grid_in.shape
    V = grid_in.coords.shape[0]
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding

    b = coords_out[:, 0:1]
    offs = _tap_offsets((kz, ky, 1))
    nz = coords_out[:, 1:2] * sz - pz + offs[None, :, 0]
    ny = coords_out[:, 2:3] * sy - py + offs[None, :, 1]
    plane_ok = (out_mask[:, None] & (nz >= 0) & (nz < D)
                & (ny >= 0) & (ny < H))
    P = offs.shape[0]
    Vout = coords_out.shape[0]

    if kx == 3:
        cx = coords_out[:, 3:4] * sx - px + 1          # middle x tap
        flat = ((b * D + nz) * H + ny) * W + jnp.clip(cx, 0, W - 1)
        flat = jnp.clip(jnp.where(plane_ok, flat, 0), 0, table_in.size - 1)
        left, cent, right = window3_lookup(table_in, flat.reshape(-1))
        left = jnp.where(plane_ok & (cx - 1 >= 0) & (cx - 1 < W),
                         left.reshape(Vout, P), V)
        cent = jnp.where(plane_ok & (cx >= 0) & (cx < W),
                         cent.reshape(Vout, P), V)
        right = jnp.where(plane_ok & (cx + 1 >= 0) & (cx + 1 < W),
                          right.reshape(Vout, P), V)
        return jnp.stack([left, cent, right], axis=-1).reshape(
            Vout, P * 3).astype(jnp.int32)

    assert kx == 1, kernel
    nx = coords_out[:, 3:4] * sx - px
    ok = plane_ok & (nx >= 0) & (nx < W)
    flat = ((b * D + nz) * H + ny) * W + jnp.clip(nx, 0, W - 1)
    flat = jnp.clip(jnp.where(ok, flat, 0), 0, table_in.size - 1)
    _, cent, _ = window3_lookup(table_in, flat.reshape(-1))
    return jnp.where(ok, cent.reshape(Vout, P), V).astype(jnp.int32)


def to_dense(feats: jnp.ndarray, grid: SparseGrid) -> jnp.ndarray:
    """Scatter the active set into a dense (B, D, H, W, C) tensor."""
    D, H, W = grid.shape
    V, C = feats.shape
    size = grid.batch * D * H * W
    flat = _flat_index(grid.coords, grid.mask, grid.shape, size)
    dense = jnp.zeros((size + 1, C), feats.dtype)
    dense = dense.at[flat].add(jnp.where(grid.mask[:, None], feats, 0.0),
                               mode="drop")
    return dense[:-1].reshape(grid.batch, D, H, W, C)
