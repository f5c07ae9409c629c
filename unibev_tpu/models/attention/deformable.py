"""Deformable-attention modules of the UniBEV transformer stack.

Four variants mirror the reference's registry names (behavioral contracts
cited per class).  All are batch-first and shape-static; the per-camera
dynamic ``nonzero`` rebatch of the reference becomes a masked dense
formulation (identical math — non-hit query outputs are zeroed and the
hit-count division reproduces the scatter-add/count of
/root/reference/projects/UniBEV/unibev_plugin/models/modules/
spatial_cross_attention_img.py:200-215).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.models.layers import xavier_uniform
from unibev_tpu.ops.msda import ms_deform_attn
from unibev_tpu.registry import ATTENTION


def grid_offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Deformable-DETR's directional grid init for the sampling-offset bias."""
    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(num_heads, dtype=jnp.float32) * (2.0 * math.pi / num_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # (H, 2)
        grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
        scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)[None, None, :, None]
        grid = grid * scale
        return grid.reshape(shape).astype(dtype)
    return init


def _offsets_and_weights(query, num_heads, num_levels, num_points, dtype):
    """Shared projection heads: sampling offsets + softmaxed attention weights."""
    B, Q, _ = query.shape
    offsets = nn.Dense(num_heads * num_levels * num_points * 2,
                       kernel_init=nn.initializers.zeros,
                       bias_init=grid_offset_bias_init(num_heads, num_levels, num_points),
                       dtype=dtype, name="sampling_offsets")(query)
    offsets = offsets.reshape(B, Q, num_heads, num_levels, num_points, 2)
    weights = nn.Dense(num_heads * num_levels * num_points,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=dtype, name="attention_weights")(query)
    weights = weights.reshape(B, Q, num_heads, num_levels * num_points)
    weights = jax.nn.softmax(weights, axis=-1)
    weights = weights.reshape(B, Q, num_heads, num_levels, num_points)
    return offsets, weights


def _normalizer(spatial_shapes) -> jnp.ndarray:
    # (levels, 2) in (W, H) order — offsets are (x, y).
    return jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)


@ATTENTION.register_module(name="MultiScaleDeformableAttention")
class MSDAttention(nn.Module):
    """mmcv MultiScaleDeformableAttention equivalent (TSA self-attention).

    Contract: /root/reference/.../decoder.py:294-338 forward — value_proj,
    loc = ref + offsets/normalizer, MSDA, output_proj, dropout + identity.
    Registered twice: 'CustomMSDeformableAttention' (decoder cross-attn,
    decoder.py:131) is the same computation.
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout: float = 0.1
    query_chunk: int = 0
    # remat the sampling op: its backward recomputes the gathered rows
    # instead of saving them (saves ~100MB-1GB of residuals per call at
    # flagship scale for ~1 extra gather pass in the backward).
    remat: bool = True
    dtype: jnp.dtype = jnp.float32

    def _sample(self, v, spatial_shapes, loc, weights):
        # Cross the checkpoint boundary with WIDE-MINOR 3D arrays: a saved
        # (B, Q, H, L, P[, 2]) residual tiles 16-64x lane-padded on TPU
        # (78 MB for 4.9 MB of attn weights at the flagship TSA shape); the
        # in-remat reshape back is free.
        B, Q = loc.shape[:2]
        lshape, wshape = loc.shape, weights.shape
        fn = lambda v_, l_, w_: ms_deform_attn(
            v_, tuple(spatial_shapes), l_.reshape(lshape), w_.reshape(wshape),
            query_chunk=self.query_chunk)
        if self.remat:
            fn = jax.checkpoint(fn)
        return fn(v, loc.reshape(B, Q, -1), weights.reshape(B, Q, -1))

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes,
                 query_pos=None, identity=None, *, deterministic: bool = True):
        """query: (B, Q, C); value: (B, V, C); reference_points: (B, Q, L, 2)."""
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        B, Q, C = query.shape
        head_dim = self.embed_dims // self.num_heads

        v = nn.Dense(self.embed_dims, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, self.num_heads, head_dim)
        offsets, weights = _offsets_and_weights(
            query, self.num_heads, self.num_levels, self.num_points, self.dtype)
        norm = _normalizer(spatial_shapes)
        loc = (reference_points[:, :, None, :, None, :]
               + offsets / norm[None, None, None, :, None, :])
        out = self._sample(v, spatial_shapes, loc, weights)
        out = nn.Dense(self.embed_dims, kernel_init=xavier_uniform,
                       dtype=self.dtype, name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


@ATTENTION.register_module(name="CustomMSDeformableAttention")
class CustomMSDeformableAttention(MSDAttention):
    """Decoder cross-attention — same math as MSDAttention (decoder.py:131-338)."""


@ATTENTION.register_module(name="MSDeformableAttention3DImg")
@ATTENTION.register_module(name="MSDeformableAttention3DPts")
class MSDeformableAttention3D(nn.Module):
    """Inner deformable attention of both SCAs — NO output proj / residual.

    Contract: spatial_cross_attention_img.py:218-442 (and the _pts twin):
    num_points total taps are split over the reference's Z anchors via the
    (points // Z, Z) reshape at :407-419.
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 8
    query_chunk: int = 0
    # Finer one-hot chunking under grad: each checkpointed chunk's backward
    # holds its dense (BH, Qc, V) sampling matrix in two layouts plus a
    # same-sized d_dense — at the flagship img-SCA shape (48, 3414, 1450)
    # that is ~1.4 GB of HBM temps (the r04 train-step OOM's top entries).
    # 1024-query chunks cut that peak ~3.3x; inference keeps the wide chunks.
    query_chunk_train: int = 1024
    remat: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes,
                 *, train: bool = False):
        """query: (B, Q, C); value: (B, V, C); reference_points: (B, Q, Z, 2)."""
        B, Q, C = query.shape
        Z = reference_points.shape[2]
        head_dim = self.embed_dims // self.num_heads
        assert self.num_points % Z == 0, (self.num_points, Z)

        v = nn.Dense(self.embed_dims, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, -1, self.num_heads, head_dim)
        offsets, weights = _offsets_and_weights(
            query, self.num_heads, self.num_levels, self.num_points, self.dtype)
        norm = _normalizer(spatial_shapes)
        offsets = offsets / norm[None, None, None, :, None, :]
        # (B,Q,H,L,P,2) -> (B,Q,H,L,P/Z,Z,2); add (B,Q,1,1,1,Z,2); flatten.
        offsets = offsets.reshape(B, Q, self.num_heads, self.num_levels,
                                  self.num_points // Z, Z, 2)
        loc = reference_points[:, :, None, None, None, :, :] + offsets
        loc = loc.reshape(B, Q, self.num_heads, self.num_levels,
                          self.num_points, 2)

        # All shapes route through the XLA packed-gather MSDA: its grouped
        # small-table fast path (ops/msda.py _slab_level_fast) measured ~3x
        # faster than the Pallas one-hot->MXU kernel that used to own the
        # small-value-map case (flagship LC 693 -> 571 ms/sample when the
        # Pallas branch was retired; ops/msda_pallas.py remains as a tested
        # reference kernel).
        chunk = (self.query_chunk_train or self.query_chunk) if train \
            else self.query_chunk
        # Wide-minor 3D checkpoint boundary (see MSDAttention._sample).
        lshape, wshape = loc.shape, weights.shape
        fn = lambda v_, l_, w_: ms_deform_attn(
            v_, tuple(spatial_shapes), l_.reshape(lshape), w_.reshape(wshape),
            query_chunk=chunk)
        if self.remat:
            fn = jax.checkpoint(fn)
        return fn(v, loc.reshape(B, Q, -1), weights.reshape(B, Q, -1))


@ATTENTION.register_module(name="SpatialCrossAttentionImg")
class SpatialCrossAttentionImg(nn.Module):
    """BEV-query -> multi-camera cross attention (masked dense).

    Per camera, every BEV query attends into that camera's feature map at its
    projected pillar points; outputs are averaged over the cameras whose
    frustum contains the pillar (hit mask), then projected + residual.
    """

    embed_dims: int = 256
    num_cams: int = 6
    dropout: float = 0.1
    deformable_attention: Optional[dict] = None
    pc_range: Optional[tuple] = None
    query_chunk: int = 0
    # Static per-camera query capacity (the TPU analog of the reference's
    # dynamic nonzero rebatch, spatial_cross_attention_img.py:141-170): only
    # the top-K queries whose pillars project into each camera run through
    # the deformable attention. 0 = masked dense (all queries, exact but 4x
    # the work at nuScenes FOVs).
    rebatch_k: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points_cam, bev_mask,
                 spatial_shapes, topk_idx=None, *, deterministic: bool = True):
        """query: (B, Q, C); value: (B, num_cam, V, C);
        reference_points_cam: (B, num_cam, Q, Z, 2); bev_mask: (B, num_cam, Q);
        topk_idx: (B, num_cam, K) precomputed hit-query indices (optional)."""
        B, Q, C = query.shape
        num_cam = value.shape[1]
        da_cfg = dict(self.deformable_attention or {})
        da_cfg.pop("type", None)
        da_cfg.setdefault("embed_dims", self.embed_dims)
        da = MSDeformableAttention3D(dtype=self.dtype, query_chunk=self.query_chunk,
                                     name="deformable_attention", **da_cfg)
        v_b = value.reshape(B * num_cam, -1, C)
        hit = bev_mask.astype(query.dtype)             # (B, cam, Q)

        if self.rebatch_k and topk_idx is not None:
            K = topk_idx.shape[-1]
            Z = reference_points_cam.shape[3]
            q_reb = jnp.take_along_axis(
                jnp.broadcast_to(query[:, None], (B, num_cam, Q, C)),
                topk_idx[..., None], axis=2)           # (B, cam, K, C)
            ref_reb = jnp.take_along_axis(
                reference_points_cam.reshape(B, num_cam, Q, Z * 2),
                topk_idx[..., None], axis=2).reshape(B, num_cam, K, Z, 2)
            sel_hit = jnp.take_along_axis(hit, topk_idx, axis=2)  # (B,cam,K)
            out = da(q_reb.reshape(B * num_cam, K, C), v_b,
                     ref_reb.reshape(B * num_cam, K, Z, 2), spatial_shapes,
                     train=not deterministic)
            out = out.reshape(B, num_cam, K, C) * sel_hit[..., None]
            # scatter-add back into the full query grid
            slots = jnp.zeros((B, Q, C), out.dtype)
            bidx = jnp.broadcast_to(jnp.arange(B)[:, None, None],
                                    (B, num_cam, K))
            slots = slots.at[bidx.reshape(-1), topk_idx.reshape(-1)].add(
                out.reshape(-1, C), mode="drop")
            count = jnp.maximum(hit.sum(axis=1), 1.0)
        else:
            q_b = jnp.broadcast_to(query[:, None], (B, num_cam, Q, C)).reshape(
                B * num_cam, Q, C)
            ref_b = reference_points_cam.reshape(B * num_cam, Q, -1, 2)
            out = da(q_b, v_b, ref_b, spatial_shapes,
                     train=not deterministic)  # (B*cam, Q, C)
            out = out.reshape(B, num_cam, Q, C)
            slots = (out * hit[..., None]).sum(axis=1)
            count = jnp.maximum(hit.sum(axis=1), 1.0)

        slots = slots / count[..., None]
        slots = nn.Dense(self.embed_dims, kernel_init=xavier_uniform,
                         dtype=self.dtype, name="output_proj")(slots)
        slots = nn.Dropout(self.dropout)(slots, deterministic=deterministic)
        return slots + query


@ATTENTION.register_module(name="SpatialCrossAttentionPts")
class SpatialCrossAttentionPts(nn.Module):
    """BEV-query -> LiDAR BEV map cross attention (dense single 'camera')."""

    embed_dims: int = 256
    dropout: float = 0.1
    deformable_attention: Optional[dict] = None
    pc_range: Optional[tuple] = None
    query_chunk: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points_lidar, spatial_shapes,
                 *, deterministic: bool = True):
        """query: (B, Q, C); value: (B, V, C);
        reference_points_lidar: (B, Q, Z, 2)."""
        da_cfg = dict(self.deformable_attention or {})
        da_cfg.pop("type", None)
        da_cfg.setdefault("embed_dims", self.embed_dims)
        da = MSDeformableAttention3D(dtype=self.dtype, query_chunk=self.query_chunk,
                                     name="deformable_attention", **da_cfg)
        out = da(query, value, reference_points_lidar, spatial_shapes)
        out = nn.Dense(self.embed_dims, kernel_init=xavier_uniform,
                       dtype=self.dtype, name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + query
