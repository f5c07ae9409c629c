"""Camera branch: ResNet (+DCN) and FPN shapes + frozen-BN behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from unibev_tpu.models.backbones.resnet import ResNet, FrozenBatchNorm
from unibev_tpu.models.necks.fpn import FPN


def test_resnet50_shapes_and_dcn():
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(1, 64, 64, 3).astype(np.float32))
    net = ResNet(depth=50, out_indices=(2, 3),
                 stage_with_dcn=(False, False, True, True),
                 dcn=dict(type="DCNv2", deform_groups=1))
    variables = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(variables, x)
    assert outs[0].shape == (1, 4, 4, 1024)   # stride 16
    assert outs[1].shape == (1, 2, 2, 2048)   # stride 32
    # constants collection exists (frozen BN stats live outside params)
    assert "constants" in variables


def test_frozen_bn_is_affine():
    x = jnp.array(np.random.RandomState(1).randn(2, 4, 4, 8).astype(np.float32))
    bn = FrozenBatchNorm(8)
    v = bn.init(jax.random.PRNGKey(0), x)
    out1 = bn.apply(v, x)
    out2 = bn.apply(v, x * 2)
    # default-init (gamma=1, beta=0, mean=0, var=1) => identity-ish transform
    np.testing.assert_allclose(np.array(out1) * 2, np.array(out2), rtol=1e-5)


def test_fpn_single_level():
    rng = np.random.RandomState(2)
    c5 = jnp.array(rng.randn(2, 8, 8, 2048).astype(np.float32))
    fpn = FPN(in_channels=(2048,), out_channels=256, num_outs=1)
    v = fpn.init(jax.random.PRNGKey(0), (c5,))
    outs = fpn.apply(v, (c5,))
    assert len(outs) == 1
    assert outs[0].shape == (2, 8, 8, 256)
