"""FPN image neck (single-level on C5 in every reference config).

Config contract (/root/reference/projects/UniBEV/configs/unibev/
unibev_nus_LC_cnw_256_modality_dropout.py:237-244): in_channels=[2048],
out_channels=256, num_outs=1, add_extra_convs='on_output',
relu_before_extra_convs=True — i.e. lateral 1x1 + 3x3 fpn conv, and extra
levels (unused at num_outs=1) would come from strided convs on the output.
The general multi-level path is implemented for completeness.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from unibev_tpu.registry import NECKS


@NECKS.register_module(name="FPN")
class FPN(nn.Module):
    in_channels: Sequence[int] = (2048,)
    out_channels: int = 256
    num_outs: int = 1
    start_level: int = 0
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        """inputs: tuple of NHWC feature maps (low->high stride)."""
        assert len(inputs) == len(self.in_channels)
        used = list(inputs[self.start_level:])
        n_used = len(used)

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(used)
        ]
        # Top-down pathway (nearest-neighbor upsample + add).
        for i in range(n_used - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn{i}")(laterals[i])
            for i in range(n_used)
        ]
        # Extra output levels from strided convs on the last output.
        extra_src = outs[-1]
        for i in range(self.num_outs - n_used):
            src = nn.relu(extra_src) if (self.relu_before_extra_convs and i > 0) else extra_src
            extra_src = nn.Conv(self.out_channels, (3, 3), strides=2, padding=1,
                                dtype=self.dtype, name=f"extra{i}")(src)
            outs.append(extra_src)
        return tuple(outs[:self.num_outs])


@NECKS.register_module(name="SECONDFPN")
class SECONDFPN(nn.Module):
    """SECOND neck: per-scale (de)conv to a common resolution, then concat.

    Config contract (:217-224): in_channels=[128, 256],
    upsample_strides=[1, 2], out_channels=[128, 128], deconv upsample,
    use_conv_for_no_stride=True, BN eps 1e-3 / momentum 0.01.
    Produces the (B, H, W, 256) LiDAR BEV map consumed by the pts encoder.
    """

    in_channels: Sequence[int] = (128, 256)
    out_channels: Sequence[int] = (128, 128)
    upsample_strides: Sequence[int] = (1, 2)
    use_conv_for_no_stride: bool = True
    norm_cfg: dict = None
    upsample_cfg: dict = None
    conv_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        outs = []
        for i, (x, stride, cout) in enumerate(
                zip(inputs, self.upsample_strides, self.out_channels)):
            if stride > 1:
                y = nn.ConvTranspose(cout, (stride, stride), strides=(stride, stride),
                                     use_bias=False, dtype=self.dtype,
                                     name=f"deblock{i}_conv")(x)
            elif self.use_conv_for_no_stride:
                y = nn.Conv(cout, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"deblock{i}_conv")(x)
            else:
                y = x
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"deblock{i}_bn")(y)
            outs.append(nn.relu(y))
        return jnp.concatenate(outs, axis=-1)
