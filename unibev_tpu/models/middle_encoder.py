"""SECOND-style sparse middle encoder (TPU gather/matmul formulation).

Topology contract from the reference config (/root/reference/projects/UniBEV/
configs/unibev/unibev_nus_LC_cnw_256_modality_dropout.py:194-208) and mmdet3d
v0.18 ``SparseEncoder`` with block_type='basicblock':

  conv_input: SubM(in 5 -> 16) + BN + ReLU
  stage0: SparseBasicBlock(16) x2, SparseConv3d(16->32, s2, p1)
  stage1: SparseBasicBlock(32) x2, SparseConv3d(32->64, s2, p1)
  stage2: SparseBasicBlock(64) x2, SparseConv3d(64->128, s2, p(0,1,1))
  stage3: SparseBasicBlock(128) x2
  conv_out: SparseConv3d(128->128, k(3,1,1), s(2,1,1)) + BN + ReLU
  to_dense: [41,1440,1440] -> (B, 2, 180, 180, 128) -> (B, 180, 180, 256)

Per-resolution index tables and the (V, 27) submanifold neighbor table are
computed once and shared by every subm conv at that resolution.
BatchNorm is mask-aware (padded voxel rows carry no statistics).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unibev_tpu.ops.sparse_conv import (_FAST_GATHER_TABLE_BYTES,
                                        SparseGrid, best_gather_conv,
                                        build_table, downsample_active_set,
                                        downsample_with_table,
                                        inverse_strided_idx, make_xpair_plan,
                                        make_xquad_plan,
                                        strided_neighbor_idx,
                                        subm_neighbor_idx, to_dense)
from unibev_tpu.registry import MIDDLE_ENCODERS, VOXEL_ENCODERS


@VOXEL_ENCODERS.register_module()
class HardSimpleVFE:
    """Mean-of-points voxel feature encoder.

    The actual mean is fused into ``voxelize_and_encode``; this class only
    carries the config contract (num_features) through the registry.
    """

    def __init__(self, num_features: int = 5):
        self.num_features = num_features


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid voxel rows only (padded rows excluded)."""

    features: int
    eps: float = 1e-3
    momentum: float = 0.01  # torch convention: ra = (1-m)*ra + m*batch
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, train: bool = False):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (self.features,))
        if train:
            m = mask[:, None].astype(jnp.float32)
            n = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * m).sum(0) / n
            var = ((xf - mean) ** 2 * m).sum(0) / n
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        out = (x - mean.astype(x.dtype)) * (inv * gamma).astype(x.dtype) \
            + beta.astype(x.dtype)
        return jnp.where(mask[:, None], out, 0.0)


class SubMConvBN(nn.Module):
    """Submanifold conv + masked BN + optional ReLU (order: conv, norm, act)."""

    out_channels: int
    relu: bool = True
    dtype: jnp.dtype = jnp.float32
    quad_dtype: str = "fp8"

    @nn.compact
    def __call__(self, feats, neighbor_idx, mask, plan=None, qplan=None,
                 *, train: bool = False):
        cin = feats.shape[-1]
        K = neighbor_idx.shape[-1]
        w = self.param("weight", nn.initializers.he_normal(),
                       (K * cin, self.out_channels))
        out = best_gather_conv(feats, neighbor_idx, w, mask, plan=plan,
                               subm=True, qplan=qplan,
                               quad_dtype=self.quad_dtype)
        out = MaskedBatchNorm(self.out_channels, dtype=self.dtype,
                              name="bn")(out, mask, train=train)
        return nn.relu(out) if self.relu else out


class SparseBasicBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    quad_dtype: str = "fp8"

    @nn.compact
    def __call__(self, feats, neighbor_idx, mask, plan=None, qplan=None,
                 *, train: bool = False):
        identity = feats
        out = SubMConvBN(self.channels, relu=True, dtype=self.dtype,
                         quad_dtype=self.quad_dtype,
                         name="conv1")(feats, neighbor_idx, mask, plan=plan,
                                       qplan=qplan, train=train)
        out = SubMConvBN(self.channels, relu=False, dtype=self.dtype,
                         quad_dtype=self.quad_dtype,
                         name="conv2")(out, neighbor_idx, mask, plan=plan,
                                       qplan=qplan, train=train)
        return nn.relu(out + identity)


@MIDDLE_ENCODERS.register_module(name="SparseEncoder")
class SparseEncoder(nn.Module):
    in_channels: int = 5
    sparse_shape: Sequence[int] = (41, 1440, 1440)   # (D, H, W)
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = ((16, 16, 32), (32, 32, 64),
                                                 (64, 64, 128), (128, 128))
    encoder_paddings: Sequence[Sequence] = ((0, 0, 1), (0, 0, 1),
                                            (0, 0, (0, 1, 1)), (0, 0))
    order: Sequence[str] = ("conv", "norm", "act")
    block_type: str = "basicblock"
    # Fixed active-set capacity after each downsample (res0 comes from the
    # voxelizer's max_voxels).
    capacities: Sequence[int] = (120000, 90000, 60000, 40000)
    # 'fp8': e4m3 x-quad gather tables — half the im2col gather rows at a
    # value quantization (config-gated; gradients stay bf16 via STE).
    table_dtype: str = "bf16"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, coords, mask, batch_size: int,
                 *, train: bool = False):
        """voxel_feats: (V, in_channels); coords: (V, 4) (b,z,y,x); mask: (V,).

        Returns (B, H/8, W/8, 2*output_channels) dense BEV features.
        """
        D, H, W = self.sparse_shape
        use_quad = self.table_dtype == "fp8"

        def want_qplan(V, C):
            # bf16 x-quad is bit-exact and auto-engages while its 4x-feats
            # table fits the fast gather window — build the plan for any
            # resolution where it (or the fp8 quad) could dispatch
            return use_quad or 8 * V * C <= _FAST_GATHER_TABLE_BYTES

        grid = SparseGrid(coords, mask, (D, H, W), batch_size)
        table = build_table(grid)
        nidx = subm_neighbor_idx(grid, table)
        # x-pair plan per resolution: tap (0,0,+1) is column 14 of the
        # (dz,dy,dx) row-major 3x3x3 table
        plan = make_xpair_plan(nidx, nidx[:, 14], nidx.shape[0])
        qplan = (make_xquad_plan(nidx, grid, table)
                 if want_qplan(nidx.shape[0], self.encoder_channels[0][0])
                 else None)

        # conv_input consumes the raw 5-channel voxel features — keep it
        # exact: quad_dtype='bf16' lets the bit-exact bf16 x-quad engage
        # (its tiny table always fits here) while never fp8-quantizing the
        # raw inputs.
        x = SubMConvBN(self.encoder_channels[0][0], dtype=self.dtype,
                       quad_dtype="bf16",
                       name="conv_input")(voxel_feats, nidx, mask, plan=plan,
                                          qplan=qplan, train=train)

        n_stages = len(self.encoder_channels)
        for i, blocks in enumerate(self.encoder_channels):
            last_is_down = i != n_stages - 1
            n_basic = len(blocks) - 1 if last_is_down else len(blocks)
            for j in range(n_basic):
                x = SparseBasicBlock(blocks[j], dtype=self.dtype,
                                     quad_dtype=self.table_dtype,
                                     name=f"stage{i}_block{j}")(
                    x, nidx, grid.mask, plan=plan, qplan=qplan, train=train)
            if last_is_down:
                pad = self.encoder_paddings[i][-1]
                pad = (pad, pad, pad) if isinstance(pad, int) else tuple(pad)
                out_shape = tuple(
                    (s + 2 * p - 3) // 2 + 1
                    for s, p in zip(grid.shape, pad))
                co, mo, new_table, _ = downsample_with_table(
                    grid.coords, grid.mask, (3, 3, 3), (2, 2, 2), pad,
                    out_shape, self.capacities[i + 1], batch_size,
                    in_shape=grid.shape, table_in=table)
                sidx = strided_neighbor_idx(grid, table, co, mo,
                                            (3, 3, 3), (2, 2, 2), pad)
                # strided plan: anchors from sidx, x-successors of the INPUT
                # resolution (sentinel = input row count)
                splan = make_xpair_plan(sidx, plan.xp1,
                                        grid.coords.shape[0])
                sqplan = (make_xquad_plan(sidx, grid, table)
                          if want_qplan(grid.coords.shape[0], x.shape[-1])
                          else None)
                # inverse table: d_feats as a gather over OUTPUT rows
                sinv = inverse_strided_idx(grid.coords, grid.mask, new_table,
                                           (3, 3, 3), (2, 2, 2), pad,
                                           out_shape, self.capacities[i + 1])
                cin = x.shape[-1]
                w = self.param(f"down{i}_weight", nn.initializers.he_normal(),
                               (27 * cin, blocks[-1]))
                x = best_gather_conv(x, sidx, w, mo, plan=splan, inv_idx=sinv,
                                     qplan=sqplan, quad_dtype=self.table_dtype)
                x = MaskedBatchNorm(blocks[-1], dtype=self.dtype,
                                    name=f"down{i}_bn")(x, mo, train=train)
                x = nn.relu(x)
                grid = SparseGrid(co, mo, out_shape, batch_size)
                table = new_table
                nidx = subm_neighbor_idx(grid, table)
                plan = make_xpair_plan(nidx, nidx[:, 14], nidx.shape[0])
                qplan = (make_xquad_plan(nidx, grid, table)
                         if want_qplan(nidx.shape[0],
                                       self.encoder_channels[i + 1][0])
                         else None)

        # conv_out: kernel (3,1,1), stride (2,1,1), padding 0 — z only.
        out_shape = ((grid.shape[0] - 3) // 2 + 1, grid.shape[1], grid.shape[2])
        co, mo, out_table, _ = downsample_with_table(
            grid.coords, grid.mask, (3, 1, 1), (2, 1, 1), (0, 0, 0),
            out_shape, self.capacities[-1], batch_size,
            in_shape=grid.shape, table_in=table)
        sidx = strided_neighbor_idx(grid, table, co, mo, (3, 1, 1), (2, 1, 1),
                                    (0, 0, 0))
        # NO x-pair plan here (the (3,1,1) kernel's taps run along Z, not X)
        # but the inverse-table backward still applies
        sinv = inverse_strided_idx(grid.coords, grid.mask, out_table,
                                   (3, 1, 1), (2, 1, 1), (0, 0, 0), out_shape,
                                   self.capacities[-1])
        cin = x.shape[-1]
        w = self.param("conv_out_weight", nn.initializers.he_normal(),
                       (3 * cin, self.output_channels))
        x = best_gather_conv(x, sidx, w, mo, plan=None, inv_idx=sinv)
        x = MaskedBatchNorm(self.output_channels, dtype=self.dtype,
                            name="conv_out_bn")(x, mo, train=train)
        x = nn.relu(x)
        grid = SparseGrid(co, mo, out_shape, batch_size)

        dense = to_dense(x, grid)                     # (B, Dz, H', W', C)
        B, Dz, Hp, Wp, C = dense.shape
        # Channel stacking matches spconv's .dense() -> view(N, C*D, H, W):
        # flattened channel index = c * Dz + d (C outer, D inner), so torch
        # checkpoints convert without a permutation.
        return dense.transpose(0, 2, 3, 4, 1).reshape(B, Hp, Wp, C * Dz)
