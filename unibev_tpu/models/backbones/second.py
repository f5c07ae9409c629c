"""SECOND BEV backbone (2D conv stacks over the flattened voxel BEV map).

Config contract (/root/reference/projects/UniBEV/configs/unibev/
unibev_nus_LC_cnw_256_modality_dropout.py:209-216): in 256 ch,
out [128, 256], layer_nums [5, 5], strides [1, 2], BN eps 1e-3 momentum
0.01, bias-free convs.  NHWC, standard XLA convs (pure MXU work).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from unibev_tpu.registry import BACKBONES


@BACKBONES.register_module(name="SECOND")
class SECOND(nn.Module):
    in_channels: int = 256
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    norm_cfg: dict = None
    conv_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, H, W, in_channels) -> tuple of per-stage NHWC maps."""
        outs = []
        for stage, (n_layers, stride, cout) in enumerate(
                zip(self.layer_nums, self.layer_strides, self.out_channels)):
            # mmdet3d SECOND: first conv of the block carries the stride,
            # followed by n_layers stride-1 convs (so n_layers+1 convs total).
            x = nn.Conv(cout, (3, 3), strides=stride, padding=1, use_bias=False,
                        dtype=self.dtype, name=f"block{stage}_conv0")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"block{stage}_bn0")(x)
            x = nn.relu(x)
            for j in range(n_layers):
                x = nn.Conv(cout, (3, 3), padding=1, use_bias=False,
                            dtype=self.dtype, name=f"block{stage}_conv{j + 1}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=self.dtype,
                                 name=f"block{stage}_bn{j + 1}")(x)
                x = nn.relu(x)
            outs.append(x)
        return tuple(outs)
