"""Radar branch: pillar voxel encoder + dense BEV scatter.

The reference detector supports a radar modality (radar voxel layer/encoder/
middle encoder, /root/reference/projects/UniBEV/unibev_plugin/models/
detectors/unibev_detector.py:77-82,126-141) fed by
``LoadRadarPointsFromMultiSweeps``; no published config enables it
(use_radar=False everywhere) but the capability is part of the surface.

TPU formulation: hard pillar voxelization (z collapsed) via the shared
segment-sum voxelizer, a PillarFeatureNet-style per-pillar MLP with masked
max-pool, and a scatter to the dense BEV grid — all static-shape.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.registry import MIDDLE_ENCODERS, VOXEL_ENCODERS


@VOXEL_ENCODERS.register_module()
class PillarFeatureNet(nn.Module):
    """Per-pillar feature MLP (Linear + BN + ReLU) on mean-pooled features."""

    in_channels: int = 7
    feat_channels: Sequence[int] = (64,)
    voxel_size: Tuple[float, float, float] = (0.8, 0.8, 8.0)
    point_cloud_range: Sequence[float] = (-54, -54, -5, 54, 54, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pillar_feats, coords, mask, *, train: bool = False):
        """pillar_feats: (V, C) mean features; coords: (V,3) (z,y,x); mask: (V,)."""
        x = pillar_feats.astype(self.dtype)
        # augment with pillar center offsets (xp, yp)
        xc = (coords[:, 2].astype(self.dtype) + 0.5) * self.voxel_size[0] \
            + self.point_cloud_range[0]
        yc = (coords[:, 1].astype(self.dtype) + 0.5) * self.voxel_size[1] \
            + self.point_cloud_range[1]
        x = jnp.concatenate(
            [x, (x[:, 0:1] - xc[:, None]), (x[:, 1:2] - yc[:, None])], axis=-1)
        for i, c in enumerate(self.feat_channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return jnp.where(mask[:, None], x, 0.0)


@MIDDLE_ENCODERS.register_module()
class PointPillarsScatter(nn.Module):
    """Scatter pillar features into the dense (B, H, W, C) BEV canvas."""

    in_channels: int = 64
    output_shape: Tuple[int, int] = (180, 180)   # (H=y, W=x)

    @nn.compact
    def __call__(self, feats, coords, mask, batch_size: int, *, train: bool = False):
        """feats: (V, C); coords: (V, 4) (b, z, y, x)."""
        H, W = self.output_shape
        V, C = feats.shape
        flat = jnp.where(mask,
                         (coords[:, 0] * H + coords[:, 2]) * W + coords[:, 3],
                         batch_size * H * W)
        canvas = jnp.zeros((batch_size * H * W + 1, C), feats.dtype)
        canvas = canvas.at[flat].add(jnp.where(mask[:, None], feats, 0.0),
                                     mode="drop")
        return canvas[:-1].reshape(batch_size, H, W, C)
