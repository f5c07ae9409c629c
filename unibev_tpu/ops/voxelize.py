"""Hard voxelization + mean VFE as one fused, static-shape segment op.

The reference uses the CUDA ``mmcv.ops.Voxelization`` hard voxelizer per
sample (/root/reference/projects/UniBEV/unibev_plugin/models/detectors/
unibev_detector.py:151-202: max 10 points/voxel, max_voxels (90k,120k)) and
feeds ``HardSimpleVFE`` (per-voxel mean of the kept points).  On TPU, the
scatter becomes a stable-sort + segment-sum: points sorted by voxel key keep
their original order inside each voxel, so the "first max_points per voxel"
truncation semantics of the hard voxelizer are preserved exactly.

Everything is fixed-shape: P input points (padded, mask), max_voxels output
rows (padded, mask).

One deliberate deviation: when the voxel count exceeds ``max_voxels`` the
reference keeps voxels in first-point-seen order while we keep the
``max_voxels`` smallest keys; the cap (90k/120k in configs) is far above the
typical ~60k occupied voxels, so this only differs on pathological clouds.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class VoxelizationResult(NamedTuple):
    feats: jnp.ndarray     # (max_voxels, F) mean feature per voxel (VFE output)
    coords: jnp.ndarray    # (max_voxels, 3) int32 (z, y, x)
    mask: jnp.ndarray      # (max_voxels,) bool
    num_voxels: jnp.ndarray  # () int32
    num_points: jnp.ndarray  # (max_voxels,) int32 points kept per voxel


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "grid_size", "max_voxels",
                     "max_points_per_voxel"))
def voxelize_and_encode(points: jnp.ndarray,
                        points_mask: jnp.ndarray,
                        voxel_size: Tuple[float, float, float],
                        pc_range: Tuple[float, ...],
                        grid_size: Tuple[int, int, int],
                        max_voxels: int,
                        max_points_per_voxel: int = 10) -> VoxelizationResult:
    """Hard-voxelize a padded point cloud and mean-pool features per voxel.

    Args:
      points: (P, F) float32 — x, y, z first, then extra features.
      points_mask: (P,) bool — validity of each padded point row.
      voxel_size: (vx, vy, vz).
      pc_range: (x0, y0, z0, x1, y1, z1).
      grid_size: (X, Y, Z) number of voxels per axis.
      max_voxels: output capacity.
      max_points_per_voxel: truncation cap (reference: 10).
    """
    P, F = points.shape
    X, Y, Z = grid_size
    vx, vy, vz = voxel_size
    x0, y0, z0 = pc_range[0], pc_range[1], pc_range[2]

    gx = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    gy = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    gz = jnp.floor((points[:, 2] - z0) / vz).astype(jnp.int32)
    in_range = ((gx >= 0) & (gx < X) & (gy >= 0) & (gy < Y)
                & (gz >= 0) & (gz < Z) & points_mask)

    big = jnp.int32(Z * Y * X)  # sentinel key larger than any real key
    key = jnp.where(in_range, (gz * Y + gy) * X + gx, big)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    svalid = skey < big

    # New-voxel boundary flags on the sorted sequence.
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]]) & svalid
    voxel_id = jnp.cumsum(first.astype(jnp.int32)) - 1          # (P,), 0-based
    # Rank of each point inside its voxel: position - position_of_first.
    pos = jnp.arange(P, dtype=jnp.int32)
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, -1))
    rank = pos - seg_start

    keep = svalid & (voxel_id < max_voxels) & (rank < max_points_per_voxel)
    seg = jnp.where(keep, voxel_id, max_voxels)                 # trash segment

    spoints = points[order]
    # ONE fused scatter-add for features + count + key: TPU scatter cost is
    # per ROW, not per lane (three separate segment ops measured 9.2 ms of
    # the LC forward — 2 x s32[120001] fusions at 2.6 ms + the f32[5,...]
    # at 3.9 ms; one (P, F+2) scatter costs the same as any one of them).
    # The voxel key rides the sum by contributing ONCE, at each voxel's
    # first kept point.
    kf = keep.astype(points.dtype)
    # keys up to Z*Y*X ~ 85M exceed f32's exact-int range (2^24): ride the
    # sum as two exact halves (each < 2^15) contributed once per voxel.
    kc = jnp.where(first, skey, 0)
    payload = jnp.concatenate(
        [jnp.where(keep[:, None], spoints, 0.0),
         kf[:, None],                                           # count
         (kf * (kc // 4096).astype(points.dtype))[:, None],
         (kf * (kc % 4096).astype(points.dtype))[:, None]],
        axis=1)                                                 # (P, F+3)
    summed = jax.ops.segment_sum(payload, seg,
                                 num_segments=max_voxels + 1)[:-1]
    feats_sum = summed[:, :F]
    counts = summed[:, F].astype(jnp.int32)
    vkey = (summed[:, F + 1].astype(jnp.int32) * 4096
            + summed[:, F + 2].astype(jnp.int32))
    feats = feats_sum / jnp.maximum(counts, 1)[:, None]
    mask = counts > 0
    cz = vkey // (Y * X)
    cy = (vkey // X) % Y
    cx = vkey % X
    coords = jnp.stack([cz, cy, cx], axis=1).astype(jnp.int32)
    coords = jnp.where(mask[:, None], coords, -1)

    return VoxelizationResult(
        feats=feats.astype(points.dtype),
        coords=coords,
        mask=mask,
        num_voxels=jnp.sum(mask.astype(jnp.int32)),
        num_points=counts)
