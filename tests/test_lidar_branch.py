"""LiDAR branch modules: SparseEncoder, SECOND, SECONDFPN shape/semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from unibev_tpu.models.middle_encoder import SparseEncoder, MaskedBatchNorm
from unibev_tpu.models.backbones.second import SECOND
from unibev_tpu.models.necks.fpn import SECONDFPN
from unibev_tpu.ops.voxelize import voxelize_and_encode


def test_sparse_encoder_end_to_end_shapes():
    """Small-scale analog of the [41,1440,1440] -> (B,180,180,256) contract."""
    rng = np.random.RandomState(0)
    # z chain mirrors the real 41->21->11->5->2: 25->13->7->3->1
    D, H, W = 25, 48, 48
    B, V = 2, 512
    pts = rng.uniform(0, 1, (4096, 5)).astype(np.float32)
    pts[:, 0] = pts[:, 0] * 3.6 - 1.8   # x range
    pts[:, 1] = pts[:, 1] * 3.6 - 1.8
    pts[:, 2] = pts[:, 2] * 1.7 - 0.85
    res = voxelize_and_encode(jnp.array(pts), jnp.ones((4096,), bool),
                              (0.075, 0.075, 1.7 / 24),
                              (-1.8, -1.8, -0.85, 1.8, 1.8, 0.85),
                              (W, H, 24), V, 10)
    coords = jnp.concatenate(
        [jnp.zeros((V, 1), jnp.int32), res.coords], axis=1)
    coords = jnp.where(res.mask[:, None], coords, -1)

    enc = SparseEncoder(in_channels=5, sparse_shape=(D, H, W),
                        capacities=(V, V, V, V))
    variables = enc.init(jax.random.PRNGKey(0), res.feats, coords, res.mask, 1)
    out = enc.apply(variables, res.feats, coords, res.mask, 1)
    assert out.shape[0] == 1
    assert out.shape[1] == H // 8 and out.shape[2] == W // 8
    assert out.shape[3] == 128  # 128 ch x 1 z-slice
    assert np.isfinite(np.array(out)).all()


def test_masked_bn_ignores_padding():
    rng = np.random.RandomState(1)
    x = rng.randn(64, 8).astype(np.float32)
    mask = np.zeros((64,), bool)
    mask[:40] = True
    bn = MaskedBatchNorm(8)
    vars0 = bn.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(mask), train=True)
    out, updated = bn.apply(vars0, jnp.array(x), jnp.array(mask), train=True,
                            mutable=["batch_stats"])
    out = np.array(out)
    # normalized valid rows ~ zero mean/unit var; padded rows exactly zero
    assert abs(out[:40].mean()) < 1e-5
    assert abs(out[:40].var() - 1.0) < 1e-2
    assert np.all(out[40:] == 0)
    # running stats must reflect only valid rows
    np.testing.assert_allclose(np.array(updated["batch_stats"]["mean"]),
                               0.01 * x[:40].mean(0), atol=1e-5)


def test_second_and_fpn_shapes():
    rng = np.random.RandomState(2)
    x = jnp.array(rng.randn(1, 48, 48, 256).astype(np.float32))
    second = SECOND()
    v = second.init(jax.random.PRNGKey(0), x)
    outs = second.apply(v, x)
    assert outs[0].shape == (1, 48, 48, 128)
    assert outs[1].shape == (1, 24, 24, 256)

    neck = SECONDFPN()
    v2 = neck.init(jax.random.PRNGKey(1), outs)
    bev = neck.apply(v2, outs)
    assert bev.shape == (1, 48, 48, 256)
