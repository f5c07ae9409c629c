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


def _fast_cumsum_binary(bitmap: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive prefix sum of a 0/1 vector in ~3 passes + one MXU matmul.

    Counts fit f32 exactly (<= 2^24 active sites by construction).
    """
    n = bitmap.shape[0]
    nb = -(-n // block)
    x = jnp.pad(bitmap.astype(jnp.float32), (0, nb * block - n))
    x2 = x.reshape(nb, block)
    tri = jnp.tril(jnp.ones((block, block), jnp.float32))   # within[i] = sum_{j<=i}
    within = jax.lax.dot_general(
        x2, tri, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (nb, block)
    block_tot = within[:, -1]
    offs = jnp.cumsum(block_tot) - block_tot                 # small (nb,)
    out = (within + offs[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


def _wide_table_lookup(table: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """table[flat] via 128-lane-row gather + one-hot lane select.

    The gather engine charges per ROW regardless of width, so gathering
    4-byte scalars wastes ~2x; fetching the 128-lane row containing each
    entry and selecting the lane on the VPU runs at the row rate.  (8-lane
    rows measured faster on a 40k-row toy table but 25 ms SLOWER in-model
    on the 10.9M-entry resolution tables — wider rows win at size.)
    """
    n = table.shape[0]
    nrows = -(-n // 128)
    t2d = jnp.pad(table, (0, nrows * 128 - n)).reshape(nrows, 128)
    rows = jnp.take(t2d, flat >> 7, axis=0)                  # (N, 128)
    lane = (flat & 127).astype(jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
              == lane[:, None])
    return jnp.where(onehot, rows, 0).sum(axis=1)


def _flat_index(coords: jnp.ndarray, mask: jnp.ndarray,
                shape: Tuple[int, int, int], trash: int) -> jnp.ndarray:
    D, H, W = shape
    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    flat = ((b * D + z) * H + y) * W + x
    return jnp.where(mask, flat, trash)


def build_table(grid: SparseGrid) -> jnp.ndarray:
    """Dense flat-coord -> row-index lookup table, sentinel V for empty."""
    D, H, W = grid.shape
    V = grid.coords.shape[0]
    size = grid.batch * D * H * W
    flat = _flat_index(grid.coords, grid.mask, grid.shape, size)
    table = jnp.full((size + 1,), V, jnp.int32)
    table = table.at[flat].set(jnp.arange(V, dtype=jnp.int32), mode="drop")
    return table[:-1]


def subm_neighbor_idx(grid: SparseGrid, table: jnp.ndarray,
                      kernel: Tuple[int, int, int] = (3, 3, 3)) -> jnp.ndarray:
    """(V, K) row indices of each active voxel's kernel-window neighbors.

    Out-of-grid / empty neighbors get index V (the zero padding row).
    Tap order is (dz, dy, dx) row-major — the weight layout contract.
    """
    D, H, W = grid.shape
    V = grid.coords.shape[0]
    kz, ky, kx = kernel

    b = grid.coords[:, 0:1]
    # All K taps in ONE set of (V, K) ops (a Python tap loop emits ~15 (V,)
    # ops per tap — 400+ ops per call site, compile-time poison and narrow
    # 1D work on the VPU).
    offs = _tap_offsets(kernel, (-(kz // 2), -(ky // 2), -(kx // 2)))
    nz = grid.coords[:, 1:2] + offs[None, :, 0]
    ny = grid.coords[:, 2:3] + offs[None, :, 1]
    nx = grid.coords[:, 3:4] + offs[None, :, 2]
    ok = (grid.mask[:, None] & (nz >= 0) & (nz < D) & (ny >= 0) & (ny < H)
          & (nx >= 0) & (nx < W))
    flat = ((b * D + nz) * H + ny) * W + nx
    flats = jnp.where(ok, flat, 0)
    # ONE batched table lookup for all K taps (K separate 4-byte-row gathers
    # are per-op-overhead-bound on TPU).
    nidx = _wide_table_lookup(table, flats.reshape(-1)).reshape(flats.shape)
    return jnp.where(ok, nidx, V).astype(jnp.int32)


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
    d_weight = jnp.dot(cols.T.astype(jnp.float32), g.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(weight.dtype)
    return d_feats, None, d_weight, None


subm_gather_conv.defvjp(_subm_gc_fwd, _subm_gc_bwd)


# ------------------------------------------------------- x-pair fast paths

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
    dw_x = jnp.dot(cols_x.T.astype(jnp.float32), g.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    d_weight = dw_x.reshape(3, P, Cin, Cout).transpose(1, 0, 2, 3).reshape(
        K * Cin, Cout).astype(weight.dtype)
    return d_feats, None, None, d_weight, None


subm_xpair_conv.defvjp(_subm_xp_fwd, _subm_xp_bwd)


def inverse_strided_idx(coords_in, mask_in, out_table,
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
    """
    Do, Ho, Wo = out_shape
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding
    b = coords_in[:, 0:1]
    offs = _tap_offsets(kernel)
    # v = i + p - d can be as low as -(k-1); shift by k*s (a multiple of the
    # stride, so quotient shifts by exactly k and remainder is unchanged)
    # to stay nonnegative and use 1-op trunc div/rem instead of jnp.divmod's
    # ~28-op signed floor chain per tap per axis.
    vz = coords_in[:, 1:2] + (pz + kz * sz) - offs[None, :, 0]
    vy = coords_in[:, 2:3] + (py + ky * sy) - offs[None, :, 1]
    vx = coords_in[:, 3:4] + (px + kx * sx) - offs[None, :, 2]
    qz = _div_nonneg(vz, sz) - kz
    qy = _div_nonneg(vy, sy) - ky
    qx = _div_nonneg(vx, sx) - kx
    ok = (mask_in[:, None]
          & (_rem_nonneg(vz, sz) == 0) & (_rem_nonneg(vy, sy) == 0)
          & (_rem_nonneg(vx, sx) == 0)
          & (qz >= 0) & (qz < Do) & (qy >= 0) & (qy < Ho)
          & (qx >= 0) & (qx < Wo))
    flat = ((b * Do + qz) * Ho + qy) * Wo + qx
    flats = jnp.where(ok, flat, 0)
    nidx = _wide_table_lookup(out_table, flats.reshape(-1)).reshape(
        flats.shape)
    return jnp.where(ok, nidx, out_capacity).astype(jnp.int32)


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
        dw_x = jnp.dot(cols_x.T.astype(jnp.float32), g.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        d_weight = dw_x.reshape(3, P, Cin, Cout).transpose(
            1, 0, 2, 3).reshape(K * Cin, Cout).astype(weight.dtype)
    else:
        feats_pad = jnp.concatenate(
            [feats, jnp.zeros((1, Cin), feats.dtype)], axis=0)
        cols = jnp.take(feats_pad, neighbor_idx.reshape(-1), axis=0).reshape(
            -1, K * Cin)
        d_weight = jnp.dot(cols.T.astype(jnp.float32),
                           g.astype(jnp.float32),
                           preferred_element_type=jnp.float32).astype(
            weight.dtype)
    return d_feats, None, None, None, d_weight, None


strided_xpair_conv.defvjp(_strided_xp_fwd, _strided_xp_bwd)


# The v5e gather engine drops from ~3.3 to ~12+ ns/row once the source table
# exceeds roughly this size (tools/microbench.py gather/subm benches); the
# x-pair scheme only wins while its 2x-feats pack table stays under it.
_FAST_GATHER_TABLE_BYTES = 20e6


def best_gather_conv(feats, neighbor_idx, weight, out_mask, plan=None,
                     subm=False, inv_idx=None):
    """Dispatch: x-pair fast path when a plan exists, feats are bf16, and
    the pair table fits the fast gather window (stage 3's 20.5 MB table
    measured SLOWER through x-pair than the plain 27-row gather).  For
    strided convs, inv_idx routes the backward through the inverse-table
    gather instead of a scatter."""
    pack_bytes = feats.shape[0] * feats.shape[1] * 4
    use_pair = (plan is not None and feats.dtype == jnp.bfloat16
                and pack_bytes <= _FAST_GATHER_TABLE_BYTES
                and neighbor_idx.shape[1] % 3 == 0)
    if subm:
        if use_pair:
            return subm_xpair_conv(feats, neighbor_idx, plan, weight, out_mask)
        return subm_gather_conv(feats, neighbor_idx, weight, out_mask)
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
                          batch: int):
    """spconv output-site generation via occupancy bitmap + prefix sum.

    Faster than the sort-based variant: the candidate sites (<= 8 per input
    voxel for k3 s2) are scattered into a dense output-resolution bitmap;
    a cumulative sum then yields BOTH the compact row index of every active
    site (the lookup table build_table would otherwise compute) and the
    sorted coordinate list (jnp.nonzero in linear order == sorted keys).

    Returns (coords_out, mask_out, table, overflow_count).
    """
    Do, Ho, Wo = out_shape
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding

    def axis_candidates(i, p, k, s, size):
        # ceil((i+p-k+1)/s) and floor((i+p)/s) via 1-op trunc div on values
        # offset nonnegative (i >= -1 for padding rows; +k*s keeps both
        # numerators >= 0 and shifts the quotient by exactly k).
        v = i + (p + k * s)
        lo = _div_nonneg(v - k + 1 + (s - 1), s) - k
        hi = _div_nonneg(v, s) - k
        lo = jnp.maximum(lo, 0)
        hi = jnp.minimum(hi, size - 1)
        n = max(1, -(-k // s))
        offs = jnp.arange(n, dtype=jnp.int32)
        cand = lo[:, None] + offs[None, :]
        ok = cand <= hi[:, None]
        return cand, ok

    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    cz, okz = axis_candidates(z, pz, kz, sz, Do)
    cy, oky = axis_candidates(y, py, ky, sy, Ho)
    cx, okx = axis_candidates(x, px, kx, sx, Wo)

    zz = cz[:, :, None, None]
    yy = cy[:, None, :, None]
    xx = cx[:, None, None, :]
    ok = (okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
          & mask[:, None, None, None])
    bb = jnp.broadcast_to(b[:, None, None, None], ok.shape)
    flat = ((bb * Do + zz) * Ho + yy) * Wo + xx
    size = batch * Do * Ho * Wo
    flat = jnp.where(ok, flat, size).reshape(-1)

    bitmap = jnp.zeros((size + 1,), jnp.bool_).at[flat].set(True,
                                                            mode="drop")[:-1]
    # Inclusive prefix sum via two-level block scan with an MXU matmul for
    # the within-block part — XLA's native cumsum lowers to ~log(N) full
    # passes over the 10M+-element grid, which dominated the encoder.
    csum = _fast_cumsum_binary(bitmap)
    total = csum[-1]
    rank = csum - 1                                   # index among active sites
    table = jnp.where(bitmap & (rank < capacity), rank, capacity).astype(jnp.int32)
    # Capacity-sized sorted coordinate list WITHOUT jnp.nonzero (whose
    # internal cumsum repeats the full-grid scan): every candidate scatters
    # its flat coord to its site's rank — duplicates write identical values.
    cand_rank = _wide_table_lookup(csum, jnp.minimum(flat, size - 1)) - 1
    cand_ok = (flat < size) & (cand_rank >= 0) & (cand_rank < capacity)
    cand_slot = jnp.where(cand_ok, cand_rank, capacity)
    flat_idx = jnp.zeros((capacity + 1,), jnp.int32).at[cand_slot].set(
        flat.astype(jnp.int32), mode="drop")[:-1]
    n_out = jnp.minimum(total, capacity)
    mask_out = jnp.arange(capacity, dtype=jnp.int32) < n_out
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


def strided_neighbor_idx(grid_in: SparseGrid, table_in: jnp.ndarray,
                         coords_out: jnp.ndarray, out_mask: jnp.ndarray,
                         kernel: Tuple[int, int, int],
                         stride: Tuple[int, int, int],
                         padding: Tuple[int, int, int]) -> jnp.ndarray:
    """(Vout, K) input-row indices for each output site of a strided conv.

    Output site o, tap (dz,dy,dx) reads input i = o*s - p + (dz,dy,dx).
    """
    D, H, W = grid_in.shape
    V = grid_in.coords.shape[0]
    kz, ky, kx = kernel
    sz, sy, sx = stride
    pz, py, px = padding

    b = coords_out[:, 0:1]
    offs = _tap_offsets(kernel)
    nz = coords_out[:, 1:2] * sz - pz + offs[None, :, 0]
    ny = coords_out[:, 2:3] * sy - py + offs[None, :, 1]
    nx = coords_out[:, 3:4] * sx - px + offs[None, :, 2]
    ok = (out_mask[:, None] & (nz >= 0) & (nz < D) & (ny >= 0) & (ny < H)
          & (nx >= 0) & (nx < W))
    flat = ((b * D + nz) * H + ny) * W + nx
    flats = jnp.where(ok, flat, 0)
    nidx = _wide_table_lookup(table_in, flats.reshape(-1)).reshape(flats.shape)
    return jnp.where(ok, nidx, V).astype(jnp.int32)


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
