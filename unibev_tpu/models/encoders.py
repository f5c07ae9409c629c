"""BEVFormer-style BEV encoders for the camera and LiDAR branches.

Geometry + layer contracts from the reference:
  * 3D pillar reference points and 2D grid points:
    /root/reference/projects/UniBEV/unibev_plugin/models/modules/
    encoder_unibev_detr_img.py:45-109 (z anchors at linspace(0.5, Z-0.5, P)/Z
    over pc z-extent; xy at cell centers normalized by bev size).
  * camera projection (point_sampling, :111-187): lidar2img 4x4, z > eps
    mask, divide by z, normalize by img_shape (NOT pad_shape — the reference
    normalizes by the un-padded (900, 1600) and samples the padded feature
    grid; we reproduce that).
  * layer op order self_attn -> norm -> cross_attn -> norm -> ffn -> norm
    (:413-481); TSA receives bev_pos as query_pos, SCA receives none.
  * the LiDAR twin's trivial sampling (encoder_unibev_detr_pts.py:104-127):
    xy of the same pillar points index the LiDAR BEV map directly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.models.attention.deformable import (MSDAttention,
                                                    SpatialCrossAttentionImg,
                                                    SpatialCrossAttentionPts)
from unibev_tpu.models.layers import FFN
from unibev_tpu.registry import TRANSFORMER_LAYER_SEQUENCES


def get_reference_points_3d(H: int, W: int, Z: float,
                            num_points_in_pillar: int) -> jnp.ndarray:
    """(P, H*W, 3) normalized pillar points; ref[p, h*W+w] = (x_w, y_h, z_p)."""
    P = num_points_in_pillar
    zs = (jnp.linspace(0.5, Z - 0.5, P) / Z)
    xs = (jnp.linspace(0.5, W - 0.5, W) / W)
    ys = (jnp.linspace(0.5, H - 0.5, H) / H)
    x = jnp.broadcast_to(xs[None, None, :], (P, H, W))
    y = jnp.broadcast_to(ys[None, :, None], (P, H, W))
    z = jnp.broadcast_to(zs[:, None, None], (P, H, W))
    return jnp.stack([x, y, z], axis=-1).reshape(P, H * W, 3)


def get_reference_points_2d(H: int, W: int) -> jnp.ndarray:
    """(H*W, 1, 2) normalized BEV cell centers in (x, y) order."""
    ys = (jnp.linspace(0.5, H - 0.5, H) / H)
    xs = (jnp.linspace(0.5, W - 0.5, W) / W)
    y = jnp.broadcast_to(ys[:, None], (H, W))
    x = jnp.broadcast_to(xs[None, :], (H, W))
    return jnp.stack([x, y], axis=-1).reshape(H * W, 1, 2)


def point_sampling_img(ref_3d: jnp.ndarray, pc_range: Sequence[float],
                       lidar2img: jnp.ndarray,
                       img_shape: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project pillar points into every camera.

    Args:
      ref_3d: (P, Q, 3) normalized pillar points (batch-shared).
      lidar2img: (B, N, 4, 4) float32.
      img_shape: (H_img, W_img) used for normalization — the reference uses
        img_metas img_shape, i.e. the pre-padding size.

    Returns:
      ref_cam: (B, N, Q, P, 2) in [0,1] (x, y); bev_mask: (B, N, Q, P) bool.
    """
    eps = 1e-5
    x = ref_3d[..., 0] * (pc_range[3] - pc_range[0]) + pc_range[0]
    y = ref_3d[..., 1] * (pc_range[4] - pc_range[1]) + pc_range[1]
    z = ref_3d[..., 2] * (pc_range[5] - pc_range[2]) + pc_range[2]
    pts = jnp.stack([x, y, z, jnp.ones_like(x)], axis=-1)      # (P, Q, 4)
    cam = jnp.einsum("bnij,pqj->bnpqi", lidar2img.astype(jnp.float32),
                     pts.astype(jnp.float32))                  # (B, N, P, Q, 4)
    zcam = cam[..., 2]
    mask = zcam > eps
    xy = cam[..., :2] / jnp.maximum(zcam[..., None], eps)
    u = xy[..., 0] / img_shape[1]
    v = xy[..., 1] / img_shape[0]
    mask &= (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
    ref_cam = jnp.stack([u, v], axis=-1)                       # (B, N, P, Q, 2)
    ref_cam = jnp.nan_to_num(ref_cam)
    # (B, N, P, Q, ·) -> (B, N, Q, P, ·)
    return ref_cam.transpose(0, 1, 3, 2, 4), mask.transpose(0, 1, 3, 2)


class BEVEncoderLayer(nn.Module):
    """One encoder layer: TSA -> LN -> SCA -> LN -> FFN -> LN (post-norm)."""

    embed_dims: int = 256
    ffn_dims: int = 512
    ffn_dropout: float = 0.1
    tsa_cfg: Optional[dict] = None
    sca_cfg: Optional[dict] = None
    modality: str = "img"
    query_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, bev_pos, ref_2d, bev_hw, ref_cross,
                 hit_mask, value_shapes, topk_idx=None,
                 *, deterministic: bool = True):
        tsa_cfg = {k: v for k, v in dict(self.tsa_cfg or {}).items() if k != "type"}
        sca_cfg = {k: v for k, v in dict(self.sca_cfg or {}).items() if k != "type"}
        query = MSDAttention(dtype=self.dtype, query_chunk=self.query_chunk,
                             name="self_attn", **tsa_cfg)(
            query, query, jnp.broadcast_to(ref_2d[None], (query.shape[0],) + ref_2d.shape),
            (bev_hw,), query_pos=bev_pos, deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)
        if self.modality == "img":
            query = SpatialCrossAttentionImg(
                embed_dims=self.embed_dims, dtype=self.dtype,
                query_chunk=self.query_chunk, name="cross_attn",
                **sca_cfg)(query, value, ref_cross, hit_mask, value_shapes,
                           topk_idx=topk_idx, deterministic=deterministic)
        else:
            query = SpatialCrossAttentionPts(
                embed_dims=self.embed_dims, dtype=self.dtype,
                query_chunk=self.query_chunk, name="cross_attn",
                **sca_cfg)(query, value, ref_cross, value_shapes,
                           deterministic=deterministic)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)
        query = FFN(self.embed_dims, self.ffn_dims, dropout=self.ffn_dropout,
                    dtype=self.dtype, name="ffn")(query, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(query)


@TRANSFORMER_LAYER_SEQUENCES.register_module(name="ImgEncoder")
class ImgEncoder(nn.Module):
    """Camera BEV encoder: N layers of TSA + camera SCA over shared queries."""

    num_layers: int = 3
    pc_range: Sequence[float] = (-54, -54, -5, 54, 54, 3)
    num_points_in_pillar: int = 4
    return_intermediate: bool = False
    embed_dims: int = 256
    ffn_dims: int = 512
    tsa_cfg: Optional[dict] = None
    sca_cfg: Optional[dict] = None
    query_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev_query, value, bev_pos, bev_h, bev_w, lidar2img,
                 img_shape, value_shapes, *, deterministic: bool = True):
        """bev_query: (B, H*W, C); value: (B, num_cam, V, C);
        lidar2img: (B, N, 4, 4); img_shape: static (H_img, W_img)."""
        Z = self.pc_range[5] - self.pc_range[2]
        ref_3d = get_reference_points_3d(bev_h, bev_w, Z, self.num_points_in_pillar)
        ref_2d = get_reference_points_2d(bev_h, bev_w)
        ref_cam, mask = point_sampling_img(ref_3d, self.pc_range, lidar2img,
                                           img_shape)
        hit = jnp.any(mask, axis=-1)                    # (B, N, Q)

        # Per-camera top-K hit-query indices, computed ONCE and reused by
        # every layer (the hit pattern is geometry-only).
        topk_idx = None
        rebatch_k = int((self.sca_cfg or {}).get("rebatch_k", 0) or 0)
        if rebatch_k:
            K = min(rebatch_k, bev_h * bev_w)
            order = jnp.argsort(~hit, axis=-1, stable=True)  # hits first
            topk_idx = order[..., :K].astype(jnp.int32)       # (B, N, K)
            # PARITY.md claims "identical math when K covers all hits" —
            # sow the overflow so that claim is checkable at runtime
            # (read via mutable=['intermediates']; tests assert it is 0).
            hit_count = hit.sum(axis=-1).astype(jnp.int32)    # (B, N)
            self.sow("intermediates", "sca_topk_overflow",
                     jnp.maximum(hit_count - K, 0))

        for i in range(self.num_layers):
            bev_query = BEVEncoderLayer(
                embed_dims=self.embed_dims, ffn_dims=self.ffn_dims,
                tsa_cfg=self.tsa_cfg, sca_cfg=self.sca_cfg, modality="img",
                query_chunk=self.query_chunk, dtype=self.dtype,
                name=f"layer{i}")(
                bev_query, value, bev_pos, ref_2d, (bev_h, bev_w),
                ref_cam, hit, value_shapes, topk_idx=topk_idx,
                deterministic=deterministic)
        return bev_query


@TRANSFORMER_LAYER_SEQUENCES.register_module(name="PtsEncoder")
class PtsEncoder(nn.Module):
    """LiDAR BEV encoder: N layers of TSA + dense SCA over the LiDAR BEV map."""

    num_layers: int = 3
    pc_range: Sequence[float] = (-54, -54, -5, 54, 54, 3)
    num_points_in_pillar_lidar: int = 4
    return_intermediate: bool = False
    embed_dims: int = 256
    ffn_dims: int = 512
    tsa_cfg: Optional[dict] = None
    sca_cfg: Optional[dict] = None
    query_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev_query, value, bev_pos, bev_h, bev_w, value_shapes,
                 *, deterministic: bool = True):
        """bev_query: (B, H*W, C); value: (B, V, C) flattened LiDAR BEV map."""
        Z = self.pc_range[5] - self.pc_range[2]
        ref_3d = get_reference_points_3d(bev_h, bev_w,
                                         Z, self.num_points_in_pillar_lidar)
        ref_2d = get_reference_points_2d(bev_h, bev_w)
        # LiDAR sampling is trivial: the normalized xy of each pillar anchor
        # indexes the BEV map directly (all anchors share xy, matching the
        # reference's (P, Q, 2) -> (Q, P, 2) permute).
        ref_lidar = jnp.broadcast_to(
            ref_3d[..., :2].transpose(1, 0, 2)[None],
            (bev_query.shape[0], bev_h * bev_w, self.num_points_in_pillar_lidar, 2))
        for i in range(self.num_layers):
            bev_query = BEVEncoderLayer(
                embed_dims=self.embed_dims, ffn_dims=self.ffn_dims,
                tsa_cfg=self.tsa_cfg, sca_cfg=self.sca_cfg, modality="pts",
                query_chunk=self.query_chunk, dtype=self.dtype,
                name=f"layer{i}")(
                bev_query, value, bev_pos, ref_2d, (bev_h, bev_w),
                ref_lidar, None, value_shapes, deterministic=deterministic)
        return bev_query
