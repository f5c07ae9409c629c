"""Multi-scale deformable attention — TPU-native core op.

Exact semantics follow the reference's torch fallback
``multi_scale_deformable_attn_pytorch`` (invoked at /root/reference/projects/
UniBEV/unibev_plugin/models/modules/spatial_cross_attention_img.py:437-438),
which is the ground truth the CUDA kernel also matches:

  * sampling locations are in [0, 1] over each level's (W, H);
  * bilinear sampling uses grid_sample align_corners=False semantics, i.e.
    pixel coordinate = loc * size - 0.5, with zero padding outside;
  * output[q] = sum_{level, point} attn_w * bilinear(value_level, loc).

TPU formulations (both verified against the torch oracle in tests):

  * ``slab``: the value map gets a 1-pixel zero ring; each sample's four
    corners then live in one (2, 2, D) slab fetched by a SINGLE gather index
    (jax.lax.gather with slice_sizes=(2,2,D)).  This quarters the index count
    vs. the naive 4-corner gather and was measured ~1.6x faster on v5e.
    Far-out-of-range locations are handled by zeroing the whole point weight
    (the ring covers the +-1-pixel boundary band exactly).
  * ``onehot``: for small value maps (the camera SCA's ~1.5k tokens), the
    sparse sampling matrix is built densely per query chunk (K fused
    compare-multiply-adds) and applied as ONE MXU matmul — gathers become
    matmul, which is where a TPU is fastest.

``spatial_shapes`` is static so every reshape is shape-static under jit.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Value maps at or below this many tokens use the one-hot MXU path under
# method="auto".  Covers the camera SCA's ~1.5k-token per-camera maps:
# forward measured 18.4 vs 20.6 ms (slab) and — decisively — the AUTODIFF
# backward is dense-matmul-shaped: 62 vs 119-159 ms per layer against the
# custom scatter backward (tools/microbench.py msdabwd).  TSA/ptsSCA
# (40k-token maps) stay on the slab path.
ONEHOT_MAX_VALUE = 2048

# Whether the custom MSDA backward argsorts scatter keys first.  Measured
# SLOWER than the plain scatter at every shape (sampling follows the BEV
# raster, so keys are nearly sorted already and XLA's scatter did not
# exploit the hint): tsa 46.7 vs 36.3 ms, scaimg 158.5 vs 118.6 ms.
SORT_SCATTER = False

# Live-buffer budget for the chunked slab backward: the re-gathered corner
# rows and the scatter contributions are (BH, Qc*P, 4D) per chunk, sized to
# stay near this many bytes (tests shrink it to force multi-chunk coverage).
BWD_CHUNK_BYTES = 128e6


def _prep_bh(value, sampling_locations, attention_weights):
    """Fold heads into batch: (B,V,H,D),(B,Q,H,L,P,2),(B,Q,H,L,P) -> per-BH."""
    B, _, nh, D = value.shape
    Q = sampling_locations.shape[1]
    L = sampling_locations.shape[3]
    value_bh = value.transpose(0, 2, 1, 3).reshape(B * nh, -1, D)
    loc_bh = sampling_locations.transpose(0, 2, 1, 3, 4, 5).reshape(
        B * nh, Q, L, -1, 2)
    attn_bh = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        B * nh, Q, L, -1)
    return value_bh, loc_bh, attn_bh, B, nh, D, Q, L


def _split_2d(loc: jnp.ndarray, attn: jnp.ndarray):
    """(BH,Q,P,2)/(BH,Q,P) -> dense 2D (BH, QP) x / y / attn.

    The narrow-minor (…, P, 2) layouts pad 16-64x under TPU tiling; every
    geometry pass over them costs the padded bytes.  One read each here, and
    the whole downstream chain (floor/clip/idx/corner weights and the custom
    backward) runs on dense (BH, QP) arrays.
    """
    BH, Q, P = attn.shape
    x2 = loc[..., 0].reshape(BH, Q * P)
    y2 = loc[..., 1].reshape(BH, Q * P)
    a2 = attn.reshape(BH, Q * P)
    return x2, y2, a2


def _geom_2d(x2, y2, H: int, W: int, dtype, stride: int = None):
    """Shared dense geometry: pixel coords, validity, corner index, lerps.

    ``stride`` is the table row stride: W+1 for _pack_v4 (default), W+2
    for _pack_v4_flat."""
    x = x2 * W - 0.5
    y = y2 * H - 0.5
    # whole-point validity: anything in [-1, size) touches a real texel or
    # the zero ring; farther out contributes exactly zero.
    valid = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
    xp = x + 1.0
    yp = y + 1.0
    x0 = jnp.floor(xp)
    y0 = jnp.floor(yp)
    lx = (xp - x0).astype(dtype)
    ly = (yp - y0).astype(dtype)
    x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
    idx = y0c * (W + 1 if stride is None else stride) + x0c   # (BH, QP)
    return idx, lx, ly, valid


def _corner_weights(a2, lx, ly, valid, dtype):
    """Bilinear corner weights with attention + validity folded in; all
    (BH, QP) dense."""
    w = (a2 * valid.astype(a2.dtype)).astype(dtype)
    lyf = ly * w
    w00 = (w - lyf) * (1 - lx)
    w01 = (w - lyf) * lx
    w10 = lyf * (1 - lx)
    w11 = lyf * lx
    return w00, w01, w10, w11


def _pack_v4(value: jnp.ndarray, H: int, W: int):
    """Corner-packed map over the zero-ring-padded grid: index (y0, x0) in
    [0,H]x[0,W]; one 4*D = 128-lane row fetches all four bilinear corners
    with zero padding waste (TPU gathers pad every slice to full tiles)."""
    BH, _, D = value.shape
    v = value.reshape(BH, H, W, D)
    v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))       # zero ring
    v4 = jnp.concatenate(
        [v[:, :-1, :-1], v[:, :-1, 1:], v[:, 1:, :-1], v[:, 1:, 1:]],
        axis=-1)                                           # (BH, H+1, W+1, 4D)
    return v4.reshape(BH, (H + 1) * (W + 1), 4 * D)


def _pack_v4_flat(value: jnp.ndarray, H: int, W: int):
    """Corner-packed map built FLAT: cell t = y0*(W+2) + x0, y0 in [0,H],
    x0 in [0,W], lanes = [v[y,x] | v[y,x+1] | v[y+1,x] | v[y+1,x+1]] of the
    zero-ring-padded map.

    Same content as _pack_v4 at a (W+2) row stride, but assembled from
    row-shifted slices of the flat padded map: the (BH,H+1,W+1,4D)-shaped
    build forced XLA into a spatial-layout relayout + a materialized
    reshape (traced ~1.3 ms per TSA layer / ~0.9 ms per SCA layer at the
    200x200 BEV shape — pad_slice/pad_maximum/copy in the pack scope).
    Cells at x0 == W+1 wrap into the next padded row — garbage, never
    addressed (x0 is clipped to [0, W]).  Returns (v4, TR, row_stride)."""
    BH, _, D = value.shape
    s = W + 2
    L = (H + 2) * s
    TR = (H + 1) * s - 1
    vf = jnp.pad(value.reshape(BH, H, W, D),
                 ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(BH, L, D)
    v4 = jnp.concatenate(
        [vf[:, :TR], vf[:, 1:TR + 1], vf[:, s:TR + s], vf[:, s + 1:]],
        axis=-1)                                           # (BH, TR, 4D)
    return v4, TR, s


def _slab2(value, H: int, W: int, P: int, x2, y2, a2) -> jnp.ndarray:
    """Reference (f32) path: one batched take_along_axis gather.

    value: (BH, H*W, D); x2/y2/a2: (BH, QP) -> (BH, Q, D).
    """
    BH, _, D = value.shape
    Q = x2.shape[1] // P
    v4 = _pack_v4(value, H, W)
    idx, lx, ly, valid = _geom_2d(x2, y2, H, W, value.dtype)
    rows = jnp.take_along_axis(v4, idx[:, :, None], axis=1)  # (BH, QP, 4D)
    w00, w01, w10, w11 = _corner_weights(a2, lx, ly, valid, value.dtype)
    samp = (rows[..., 0 * D:1 * D] * w00[:, :, None]
            + rows[..., 1 * D:2 * D] * w01[:, :, None]
            + rows[..., 2 * D:3 * D] * w10[:, :, None]
            + rows[..., 3 * D:4 * D] * w11[:, :, None])
    # NOTE: keep the P-sum as a reduce on the 4D view — XLA fuses it into
    # the lerp producer; a 2D slice-add variant materialized the pre-sum
    # tensor and measured ~13 ms slower at the SCA-img shape.
    return samp.reshape(BH, Q, P, D).sum(axis=2)


def _slab2_fast(value, H: int, W: int, P: int, x2, y2, a2) -> jnp.ndarray:
    """Small-table fast path: per-head-group gathers from <=20 MB tables.

    The v5e gather engine runs at ~3.4 ns/row when the source table stays
    under ~20 MB and ~12 ns/row above (measured, tools/microbench.py), so
    instead of one batched gather over all BH heads' corner-packed maps we
    loop over groups of heads whose stacked tables fit the fast window.
    promise_in_bounds indexing kills the jnp.take fill-select (a full-width
    extra pass); corner weights fold attention weight and validity.
    """
    BH, _, D = value.shape
    Q = x2.shape[1] // P
    v4, TR, rstride = _pack_v4_flat(value, H, W)
    idx, lx, ly, valid = _geom_2d(x2, y2, H, W, value.dtype, stride=rstride)
    w00, w01, w10, w11 = _corner_weights(a2, lx, ly, valid, value.dtype)

    # NOTE: an MXU-reduction variant (rows * wide-broadcast weights, then a
    # stacked-identity matmul over (P, corner)) DEVICE-traced 2x slower than
    # this slice-FMA form (13.3 vs 6.7 ms at the TSA shape) — XLA
    # materialized the broadcast corner-weight planes.  A D-major corner
    # packing (lane = d*4+corner, dense-lane reduces) traced 10x SLOWER
    # (60.4 vs 5.8 ms): the (., D, 4) minor-split views materialize 32x
    # lane-padded.  Wall-clock timing under the axon relay is unreliable;
    # trust only trace-derived times for these comparisons.
    # Deformable sampling is spatially LOCAL (points cluster around each
    # query's BEV cell), so these gathers run cache-friendly at ~1.5 ns/row
    # — the microbench's ~20 MB random-access cliff does not apply, and
    # fewer, larger head groups amortize the per-group fusion overhead.
    # Measured in-model at the 200x200 BEV shape (10.34 MB/head tables):
    # G=1 432.9 ms LC, G=2 409.2 (best), G=8 414.2 — 21e6 pins G=2.
    bytes_per_head = TR * 4 * D * value.dtype.itemsize
    G = max(1, min(BH, int(21e6 // max(bytes_per_head, 1))))
    while BH % G:
        G -= 1
    offs = (jnp.arange(G, dtype=jnp.int32) * TR)[:, None]
    outs = []
    for g in range(0, BH, G):
        tab = v4[g:g + G].reshape(G * TR, 4 * D)
        fidx = (idx[g:g + G] + offs).reshape(-1)
        rows = tab.at[fidx].get(mode="promise_in_bounds")
        rows = rows.reshape(G, Q * P, 4 * D)
        samp = (rows[..., 0 * D:1 * D] * w00[g:g + G, :, None]
                + rows[..., 1 * D:2 * D] * w01[g:g + G, :, None]
                + rows[..., 2 * D:3 * D] * w10[g:g + G, :, None]
                + rows[..., 3 * D:4 * D] * w11[g:g + G, :, None])
        outs.append(samp.reshape(G, Q, P, D).sum(axis=2))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _slab_level(value: jnp.ndarray, H: int, W: int,
                loc: jnp.ndarray, attn: jnp.ndarray) -> jnp.ndarray:
    """Narrow-interface wrapper over the dense-2D core (kept for tests /
    the Pallas reference kernel)."""
    P = loc.shape[2]
    x2, y2, a2 = _split_2d(loc, attn)
    return _slab2(value, H, W, P, x2, y2, a2)


def _slab_level_fast(value: jnp.ndarray, H: int, W: int,
                     loc: jnp.ndarray, attn: jnp.ndarray) -> jnp.ndarray:
    """Narrow-interface wrapper over the dense-2D fast core (tests)."""
    P = loc.shape[2]
    x2, y2, a2 = _split_2d(loc, attn)
    return _slab2_fast(value, H, W, P, x2, y2, a2)


def _onehot_level(value: jnp.ndarray, H: int, W: int,
                  loc: jnp.ndarray, attn: jnp.ndarray,
                  query_chunk: int = 4096) -> jnp.ndarray:
    """One level via dense sampling-matrix build + MXU matmul (small V only).

    The dense (Q, H*W) matrix is built SEPARABLY: bilinear corner weights
    factor as (2-hot over rows) x (2-hot over columns), so the build is P
    outer-product FMA passes over the (H, W) grid plus P*(2H+2W) row/column
    compares — vs the 4P compare-convert-FMA passes over all H*W cells of
    the flat one-hot form.  Out-of-range corners fall out naturally: a
    clipped-out y0/x0 matches no iota entry, zeroing that axis factor.
    """
    BH, V, D = value.shape
    Q, P = loc.shape[1], loc.shape[2]

    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(value.dtype)
    ly = (y - y0).astype(value.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    n_chunks = max(1, -(-Q // query_chunk))
    Qc = -(-Q // n_chunks)
    pad = n_chunks * Qc - Q
    if pad:
        # pad corners out of range: they match no iota row/col -> zero weight
        x0i = jnp.pad(x0i, ((0, 0), (0, pad), (0, 0)), constant_values=-9)
        y0i = jnp.pad(y0i, ((0, 0), (0, pad), (0, 0)), constant_values=-9)
        lx = jnp.pad(lx, ((0, 0), (0, pad), (0, 0)))
        ly = jnp.pad(ly, ((0, 0), (0, pad), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, pad), (0, 0)))

    iota_h = jnp.arange(H, dtype=jnp.int32)
    iota_w = jnp.arange(W, dtype=jnp.int32)

    def run_chunk(args):
        y0c, x0c, lyc, lxc, ac = args                       # (BH, Qc, P)
        ac = ac.astype(value.dtype)
        # per-axis 2-hot bilinear factors; attention weight folded into wy
        wy = ((y0c[..., None] == iota_h).astype(value.dtype) * ((1 - lyc) * ac)[..., None]
              + ((y0c + 1)[..., None] == iota_h).astype(value.dtype) * (lyc * ac)[..., None])
        wx = ((x0c[..., None] == iota_w).astype(value.dtype) * (1 - lxc)[..., None]
              + ((x0c + 1)[..., None] == iota_w).astype(value.dtype) * lxc[..., None])
        dense = 0.0
        for p in range(P):                                  # unrolled outer products
            dense = dense + wy[..., p, :, None] * wx[..., p, None, :]
        dense = dense.reshape(BH, y0c.shape[1], V)
        return jnp.einsum("bqv,bvd->bqd", dense, value,
                          preferred_element_type=jnp.float32).astype(value.dtype)

    # checkpoint the chunk body: without it every chunk's dense (Qc, V)
    # sampling matrix is saved as a residual (measured 20 x 1.7 GB at the
    # SCA-img train shape — instant OOM); recomputing it per chunk in the
    # backward is a few compare-FMA passes.  The chunk loop is UNROLLED
    # python (n_chunks <= ~4): a lax.map accumulated its output through
    # per-iteration dynamic-update-slices that cost 45 ms at inference.
    run_chunk_ckpt = jax.checkpoint(run_chunk)
    packed = (y0i, x0i, ly, lx, attn)
    if n_chunks == 1:
        out = run_chunk_ckpt(packed)
    else:
        outs = [run_chunk_ckpt(tuple(a[:, c * Qc:(c + 1) * Qc]
                                     for a in packed))
                for c in range(n_chunks)]
        out = jnp.concatenate(outs, axis=1)
    return out[:, :Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _slab_level_op2(H: int, W: int, P: int, value, x2, y2, a2):
    """Dense-2D slab level with a hand-written backward: the autodiff
    d_value is a RANDOM scatter-add (~10x slower than gathers at the same
    row count on TPU).  All loc/attn traffic — forward geometry, backward
    chunking, and the returned cotangents — is (BH, QP) dense, so no
    16-64x lane-padded (…, P[, 2]) tile ever crosses the op boundary."""
    if value.dtype == jnp.bfloat16:
        return _slab2_fast(value, H, W, P, x2, y2, a2)
    return _slab2(value, H, W, P, x2, y2, a2)


def _slab_level_op(H: int, W: int, value, loc, attn):
    """Narrow-interface wrapper (tests): grads flow through the 2D VJP plus
    the (fused) slice/reshape adjoints of the split."""
    P = loc.shape[2]
    x2, y2, a2 = _split_2d(loc, attn)
    return _slab_level_op2(H, W, P, value, x2, y2, a2)


def _slab_level_op2_fwd(H, W, P, value, x2, y2, a2):
    return _slab_level_op2(H, W, P, value, x2, y2, a2), (value, x2, y2, a2)


def _slab_level_op2_bwd(H, W, P, res, g):
    """Wide-layout discipline throughout: all big intermediates are either
    (BH, QPc) 2D or (BH, QPc, 4D=128-lane) — per-corner stacks/5D reshapes
    with <128-lane minors pad 4-32x under TPU tiling and OOMed the flagship
    train step when this backward was first written naively.

    The whole backward is CHUNKED over Q: the re-gathered corner rows and
    the scatter contribution buffer are (BH, Qc*P, 4D) per chunk, bounded
    to ~128 MB.  Unchunked, the TSA/ptsSCA backwards held ~1.5 GB of these
    concurrently (plus XLA's narrow per-corner fusion outputs padding 4x)
    and pushed the flagship train step 134 MB past HBM.
    """
    value, x2, y2, a2 = res
    BH, _, D = value.shape
    Q = x2.shape[1] // P
    TR = (H + 1) * (W + 1)

    # corner-packed table, built ONCE (shared by every chunk) — flat build
    # (no spatial relayout) for the re-gather; the d_value scatter keeps
    # the dense (H+1, W+1) raster below.
    v4g, TRg, rstride = _pack_v4_flat(value, H, W)

    row_bytes_per_q = BH * P * 4 * D * value.dtype.itemsize
    qc = max(1, int(BWD_CHUNK_BYTES // max(row_bytes_per_q, 1)))
    n_chunks = max(1, -(-Q // qc))
    qc = -(-Q // n_chunks)

    # head-group sizes for the re-gather (2 heads per table — same
    # locality argument and in-model measurement as the forward's G) and
    # the on-chip scatter targets (<=12 MB)
    bytes_per_head = TRg * 4 * D * value.dtype.itemsize
    Gg = max(1, min(BH, int(21e6 // max(bytes_per_head, 1))))
    while BH % Gg:
        Gg -= 1
    offs_g = (jnp.arange(Gg, dtype=jnp.int32) * TRg)[:, None]
    Gs = max(1, min(BH, int(12e6 // max(bytes_per_head, 1))))
    while BH % Gs:
        Gs -= 1
    offs_s = (jnp.arange(Gs, dtype=jnp.int32) * TR)[:, None]

    d_v4 = None
    d_attn_parts, d_loc_parts = [], []
    for q0 in range(0, Q, qc):
        q1 = min(Q, q0 + qc)
        Qc = q1 - q0
        QP = Qc * P

        # ---- geometry, all (BH, QP) from the dense residuals
        sl_q = slice(q0 * P, q1 * P)
        x = x2[:, sl_q] * W - 0.5
        y = y2[:, sl_q] * H - 0.5
        valid = ((x > -1.0) & (x < W)
                 & (y > -1.0) & (y < H)).astype(jnp.float32)
        xp = x + 1.0
        yp = y + 1.0
        x0 = jnp.floor(xp)
        y0 = jnp.floor(yp)
        lx = (xp - x0).astype(jnp.float32)
        ly = (yp - y0).astype(jnp.float32)
        x0c = jnp.clip(x0.astype(jnp.int32), 0, W)
        y0c = jnp.clip(y0.astype(jnp.int32), 0, H)
        idx = y0c * (W + 1) + x0c           # scatter raster (BH, QP)
        idx_g = y0c * rstride + x0c         # flat-table gather index

        # re-gather the corner rows with the SAME per-head-group fast-window
        # gather as the forward: a batched take_along_axis over all BH heads
        # is one gather from an ~80 MB table (~3x the slow-window rate —
        # traced 24.5 vs 16.1 ms at the ptsSCA shape); grouped <=20 MB
        # tables stay at the engine's fast rate.
        row_parts = []
        for hg in range(0, BH, Gg):
            tab = v4g[hg:hg + Gg].reshape(Gg * TRg, 4 * D)
            fidx = (idx_g[hg:hg + Gg] + offs_g).reshape(-1)
            row_parts.append(tab.at[fidx].get(mode="promise_in_bounds"))
        rows = (jnp.concatenate(row_parts, axis=0) if len(row_parts) > 1
                else row_parts[0]).reshape(BH, QP, 4 * D)

        a = a2[:, sl_q].astype(jnp.float32) * valid
        u00 = (1 - lx) * (1 - ly)
        u01 = lx * (1 - ly)
        u10 = (1 - lx) * ly
        u11 = lx * ly

        # <rows corner c, g> over D.  Everything here stays (BH, QP) 2D or
        # (BH, QP, 128)-lane: the first version reduced (BH, Qc, P, D) to
        # (BH, Qc, P) — a minor-4 output that tiles 32x padded, and whose
        # reshape to (BH, QP) is a physical copy — 16.8 ms/layer of the TSA
        # backward went to exactly those padded writes+copies.  g is tiled
        # 4x across the corner lanes once per chunk (one 128-lane-dense
        # materialization) so each corner dot is a dense slice-mul-reduce
        # with a dense 2D output.  (An einsum bqkd,bqd->bqk variant traced
        # 3x slower still — 2-batch-dim dot_general lowers to padded 32x32
        # matvecs.)
        g_c = g[:, q0:q1]
        g128 = jnp.broadcast_to(
            jnp.tile(g_c, (1, 1, 4))[:, :, None, :],
            (BH, Qc, P, 4 * D)).reshape(BH, QP, 4 * D)

        def cdot(c):
            sl = slice(c * D, (c + 1) * D)
            return (rows[..., sl].astype(jnp.float32)
                    * g128[..., sl].astype(jnp.float32)).sum(-1)

        gv0, gv1, gv2, gv3 = cdot(0), cdot(1), cdot(2), cdot(3)
        gs = u00 * gv0 + u01 * gv1 + u10 * gv2 + u11 * gv3
        d_attn_parts.append((gs * valid).astype(a2.dtype))     # (BH, QP)

        dx = ((gv1 - gv0) * (1 - ly) + (gv3 - gv2) * ly) * a
        dy = ((gv2 - gv0) * (1 - lx) + (gv3 - gv1) * lx) * a
        d_loc_parts.append((dx * W, dy * H))                   # (BH, QP) x2

        # d_value: contribution rows (N, 4D) built as ONE concat of fused
        # broadcast-multiplies (never materializing narrow pieces), then a
        # SORTED scatter-add.  g enters as a (BH, Qc, 1, D) broadcast over
        # P — a plain broadcast (no reshape) that XLA fuses into the
        # multiplies, so no (..., D)-minor repeat of g ever hits HBM.
        gq = g_c.astype(value.dtype)[:, :, None, :]          # (BH, Qc, 1, D)

        def cpiece(u):
            w = (u * a).reshape(BH, Qc, P, 1).astype(value.dtype)
            return gq * w                                    # (BH, Qc, P, D)

        contrib_b = jnp.concatenate(
            [cpiece(u00), cpiece(u01), cpiece(u10), cpiece(u11)],
            axis=-1).reshape(BH, QP, 4 * D)
        # accumulate in the VALUE dtype (bf16 matches what plain autodiff of
        # the bf16 forward would do, and halves the scatter's 4KB-per-row
        # traffic).  Scatter PER HEAD-GROUP: each target table is then
        # ~10 MB, small enough for the read-modify-write to stay on-chip.
        parts = []
        for hs in range(0, BH, Gs):
            k = (idx[hs:hs + Gs] + offs_s).reshape(-1)
            c = contrib_b[hs:hs + Gs].reshape(-1, 4 * D)
            if SORT_SCATTER:
                order = jnp.argsort(k)
                part = jnp.zeros((Gs * TR, 4 * D), value.dtype).at[
                    k[order]].add(c[order], indices_are_sorted=True)
            else:
                part = jnp.zeros((Gs * TR, 4 * D), value.dtype).at[k].add(c)
            parts.append(part)
        chunk_d = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                   else parts[0]).reshape(BH, TR, 4 * D)
        d_v4 = chunk_d if d_v4 is None else d_v4 + chunk_d

    # all loc/attn cotangents leave DENSE (BH, QP); any (.., P[, 2]) shaping
    # happens in the caller's (fused) slice/reshape adjoints
    d_a2 = (d_attn_parts[0] if len(d_attn_parts) == 1
            else jnp.concatenate(d_attn_parts, axis=1))
    d_x2 = (d_loc_parts[0][0] if len(d_loc_parts) == 1
            else jnp.concatenate([p[0] for p in d_loc_parts], axis=1))
    d_y2 = (d_loc_parts[0][1] if len(d_loc_parts) == 1
            else jnp.concatenate([p[1] for p in d_loc_parts], axis=1))
    d_v4 = d_v4.reshape(BH, H + 1, W + 1, 4 * D)

    # unpack the corner-packed adjoint with shifted adds, then crop the ring
    def corner(c, py, px):
        t = d_v4[..., c * D:(c + 1) * D]
        return jnp.pad(t, ((0, 0), py, px, (0, 0)))
    d_vpad = (corner(0, (0, 1), (0, 1)) + corner(1, (0, 1), (1, 0))
              + corner(2, (1, 0), (0, 1)) + corner(3, (1, 0), (1, 0)))
    d_value = d_vpad[:, 1:H + 1, 1:W + 1, :].reshape(
        BH, H * W, D).astype(value.dtype)
    return (d_value, d_x2.astype(x2.dtype), d_y2.astype(y2.dtype), d_a2)


_slab_level_op2.defvjp(_slab_level_op2_fwd, _slab_level_op2_bwd)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "query_chunk",
                                             "method"))
def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Tuple[Tuple[int, int], ...],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   query_chunk: int = 0,
                   method: str = "auto") -> jnp.ndarray:
    """Multi-scale deformable attention.

    Args:
      value: (B, num_value, heads, dim) with num_value = sum_l H_l*W_l.
      spatial_shapes: static tuple of (H_l, W_l).
      sampling_locations: (B, Q, heads, levels, points, 2) in [0,1], xy order.
      attention_weights: (B, Q, heads, levels, points).
      query_chunk: chunk size for the onehot path's dense matrix (0 = default).
      method: 'auto' | 'slab' | 'onehot'.

    Returns:
      (B, Q, heads * dim)
    """
    value_bh, loc_bh, attn_bh, B, nh, D, Q, L = _prep_bh(
        value, sampling_locations, attention_weights)

    level_sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in level_sizes:
        offsets.append(offsets[-1] + s)
    assert offsets[-1] == value.shape[1], (offsets, value.shape)

    out = 0.0
    for l, (H, W) in enumerate(spatial_shapes):
        v_l = value_bh[:, offsets[l]:offsets[l + 1], :]
        use_onehot = (method == "onehot" or
                      (method == "auto" and H * W <= ONEHOT_MAX_VALUE))
        if use_onehot:
            out = out + _onehot_level(v_l, H, W, loc_bh[:, :, l],
                                      attn_bh[:, :, l],
                                      min(query_chunk or 4096, 4096))
        else:
            # custom-VJP op: dtype-dispatched forward, sorted-scatter backward
            out = out + _slab_level_op(H, W, v_l, loc_bh[:, :, l],
                                       attn_bh[:, :, l])

    return out.reshape(B, nh, Q, D).transpose(0, 2, 1, 3).reshape(B, Q, nh * D)
