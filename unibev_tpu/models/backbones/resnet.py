"""ResNet (caffe-style) image backbone with optional DCNv2 stages.

Config contract from the reference (/root/reference/projects/UniBEV/configs/
unibev/unibev_nus_LC_cnw_256_modality_dropout.py:225-236): depth 101, caffe
style (stride on the first 1x1 of each bottleneck), out_indices=(3,), BN
frozen everywhere (norm_eval + requires_grad=False), stage 1 frozen,
DCNv2 on stages 3-4, gradient checkpointing (with_cp).

TPU-first choices: NHWC layout; frozen BN is a pure per-channel affine
(y = (x - mean) / sqrt(var + eps) * gamma + beta with all four stored in the
``constants`` collection, so the optimizer never sees them and checkpoint
conversion writes straight into them); the deformable 3x3 uses the shared
bilinear-gather op from unibev_tpu.ops.deform_conv.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from unibev_tpu.ops.deform_conv import modulated_deform_conv2d
from unibev_tpu.registry import BACKBONES

ARCH_SETTINGS = {
    # depth 26 = one Bottleneck per stage: same channel/stride/DCN structure
    # and stage-4 width (2048) as depth 50/101 at ~1/4 the block count — used
    # by the multichip dryrun/tests where compile time on the 1-core host is
    # the budget, never by a production config.
    26: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently-frozen statistics and affine params."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        gamma = self.variable("constants", "gamma", nn.initializers.ones, None, shape).value
        beta = self.variable("constants", "beta", nn.initializers.zeros, None, shape).value
        mean = self.variable("constants", "mean", nn.initializers.zeros, None, shape).value
        var = self.variable("constants", "var", nn.initializers.ones, None, shape).value
        scale = (gamma / jnp.sqrt(var + self.eps)).astype(x.dtype)
        bias = (beta - mean * gamma / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return x * scale + bias


class DeformConv2d(nn.Module):
    """mmcv ModulatedDeformConv2dPack equivalent: offset conv (zero-init) + DCN."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    deform_groups: int = 1
    table_dtype: str = "bf16"   # 'fp8': quad-packed e4m3 gather tables
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size * self.kernel_size
        # conv_offset produces (dy,dx) interleaved per tap + mask logits;
        # zero-init so training starts as a plain conv with 0.5 modulation.
        off_mask = nn.Conv(3 * K * self.deform_groups,
                           (self.kernel_size, self.kernel_size),
                           strides=self.stride,
                           padding=self.dilation,
                           kernel_dilation=self.dilation,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype,
                           name="conv_offset")(x)
        o1, o2, mask_logits = jnp.split(off_mask, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask_logits)
        cin = x.shape[-1]
        weight = self.param("weight",
                            nn.initializers.he_normal(),
                            (K * cin, self.features))
        out = modulated_deform_conv2d(
            x, offset, mask, weight, bias=None,
            kernel_size=(self.kernel_size, self.kernel_size),
            stride=self.stride, padding=self.dilation, dilation=self.dilation,
            table_dtype=self.table_dtype)
        # named for the block remat policy: saving the DCN output (17.8 MB
        # at stage 3) lets the backward's remat recompute skip the whole
        # deformable gather+lerp+matmul forward (~3 ms/block) at ~430 MB
        # total — affordable, unlike saving full block activations.
        return checkpoint_name(out, "dcn_out")


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dcn_table_dtype: str = "bf16"
    style: str = "caffe"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        expansion = 4
        # caffe style puts the stride on conv1 (1x1); pytorch style on conv2.
        conv1_stride = self.stride if self.style == "caffe" else 1
        conv2_stride = 1 if self.style == "caffe" else self.stride

        identity = x
        out = nn.Conv(self.planes, (1, 1), strides=conv1_stride, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)

        if self.with_dcn:
            out = DeformConv2d(self.planes, stride=conv2_stride,
                               table_dtype=self.dcn_table_dtype,
                               dtype=self.dtype, name="conv2")(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=conv2_stride, padding=1,
                          use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(self.planes * expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * expansion, name="bn3")(out)

        if self.downsample:
            identity = nn.Conv(self.planes * expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes * expansion,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module(name="ResNet")
class ResNet(nn.Module):
    """Caffe-style ResNet, NHWC, frozen BN, optional DCN + remat per block."""

    depth: int = 101
    num_stages: int = 4
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = 1
    style: str = "caffe"
    with_cp: bool = False
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    dcn: Optional[dict] = None
    norm_cfg: Optional[dict] = None   # accepted for config parity (BN always frozen)
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) -> tuple of NHWC stage outputs at out_indices."""
        blocks_per_stage = ARCH_SETTINGS[self.depth][:self.num_stages]
        conv1 = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")
        bn1 = FrozenBatchNorm(64, name="bn1")

        def stem(conv1, bn1, y):
            y = nn.relu(bn1(conv1(y)))
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        # Remat the stem: un-remat'd, the conv1 output + its relu at half
        # image resolution were the two LARGEST buffers of the flagship
        # train step (554 MB at 2x lane padding + 300 MB — the r03 HBM OOM's
        # top HLO temps), held across the whole forward for the maxpool/relu
        # backward.  Recomputing the stem costs one ~22 GFLOP 7x7 conv +
        # three cheap elementwise passes in the backward.
        if self.with_cp:
            x = nn.remat(stem)(conv1, bn1, x)
        else:
            x = stem(conv1, bn1, x)
        # mmcv _freeze_stages: frozen_stages >= 0 sets requires_grad=False on
        # the stem — torch computes NO gradients there.  stop_gradient is the
        # exact analog (the image input carries no grad, so zero cotangents
        # make the whole frozen backward dead code) vs computing-then-zero-
        # scaling the frozen grads.  The optimizer's lr-0 paramwise rules
        # stay as a second guard.
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(blocks_per_stage):
            stride = 1 if stage == 0 else 2
            with_dcn = bool(self.stage_with_dcn[stage]) and self.dcn is not None
            for b in range(n_blocks):
                block = Bottleneck(planes=planes,
                                   stride=stride if b == 0 else 1,
                                   downsample=(b == 0),
                                   with_dcn=with_dcn,
                                   dcn_table_dtype=(self.dcn or {}).get(
                                       "table_dtype", "bf16"),
                                   style=self.style,
                                   dtype=self.dtype,
                                   name=f"layer{stage + 1}_{b}")
                # NOTE: remat must stay on for ALL stages: skipping it for
                # the 16x/32x DCN stages to avoid ~45 ms of backward
                # re-gathers was tried and OOMs by 1.3 GB (the saved
                # activations coexist with the DCN backward's 640 MB
                # contribution buffers).  UNIBEV_DCN_SAVE (default ON)
                # keeps just the named DCN outputs (~430 MB) so the remat
                # recompute skips the expensive deformable forward while
                # everything else is rematerialized.  HBM fit at flagship
                # scale is gated by tools/memcheck_flagship.py (the r03
                # regression shipped exactly because this comment once
                # claimed an un-re-measured fit).  UNIBEV_DCN_SAVE=0 trades
                # ~3 ms/block of backward re-gathers for the 430 MB.
                if self.with_cp:
                    if os.environ.get("UNIBEV_DCN_SAVE", "1") == "1":
                        x = nn.remat(
                            lambda mdl, y: mdl(y),
                            policy=jax.checkpoint_policies
                            .save_only_these_names("dcn_out"))(block, x)
                    else:
                        x = nn.remat(lambda mdl, y: mdl(y))(block, x)
                else:
                    x = block(x)
            # mmcv freezes layer{1..frozen_stages} (requires_grad=False)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
