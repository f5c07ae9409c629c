"""MSDA op vs an independent torch grid_sample implementation.

The torch oracle below mirrors mmcv's ``multi_scale_deformable_attn_pytorch``
semantics (grid_sample, align_corners=False, zero padding), which is the
contract the reference's CUDA kernel also satisfies.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from unibev_tpu.ops.msda import ms_deform_attn


def torch_msda(value, spatial_shapes, sampling_locations, attention_weights):
    bs, _, num_heads, dim = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for level, (H, W) in enumerate(spatial_shapes):
        v = value_list[level].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, dim, H, W)
        grid = sampling_grids[:, :, :, level].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        out.append(sampled)
    attn = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_queries, num_levels * num_points)
    res = (torch.stack(out, dim=-2).flatten(-2) * attn).sum(-1).view(
        bs, num_heads * dim, num_queries)
    return res.transpose(1, 2).contiguous()


@pytest.mark.parametrize("levels,chunk,method", [
    (((12, 20),), 0, "auto"),
    (((12, 20), (6, 10)), 0, "auto"),
    (((12, 20),), 8, "onehot"),
    (((12, 20),), 0, "slab"),
    (((60, 60),), 0, "slab"),
])
def test_msda_matches_torch(levels, chunk, method):
    rng = np.random.RandomState(3)
    B, Q, H, D, P = 2, 32, 4, 8, 5
    num_value = sum(h * w for h, w in levels)
    value = rng.randn(B, num_value, H, D).astype(np.float32)
    # include out-of-range locations to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, len(levels), P, 2)).astype(np.float32)
    attn = rng.rand(B, Q, H, len(levels), P).astype(np.float32)
    attn /= attn.sum(axis=(3, 4), keepdims=True)

    ours = np.array(ms_deform_attn(jnp.array(value), levels, jnp.array(loc),
                                   jnp.array(attn), query_chunk=chunk,
                                   method=method))
    ref = torch_msda(torch.from_numpy(value), levels,
                     torch.from_numpy(loc), torch.from_numpy(attn)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_msda_grad_finite():
    import jax
    rng = np.random.RandomState(0)
    levels = ((8, 8),)
    B, Q, H, D, P = 1, 16, 2, 4, 4
    value = jnp.array(rng.randn(B, 64, H, D).astype(np.float32))
    loc = jnp.array(rng.uniform(0, 1, size=(B, Q, H, 1, P, 2)).astype(np.float32))
    attn = jnp.array(rng.rand(B, Q, H, 1, P).astype(np.float32))

    def loss(v, l, a):
        return ms_deform_attn(v, levels, l, a).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
    for g in grads:
        assert np.all(np.isfinite(np.array(g)))


def test_grid_sample_matches_torch():
    from unibev_tpu.ops.grid_sample import bilinear_grid_sample
    rng = np.random.RandomState(5)
    B, H, W, C = 2, 9, 13, 4
    im = rng.randn(B, H, W, C).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (B, 6, 7, 2)).astype(np.float32)
    ours = np.array(bilinear_grid_sample(jnp.array(im), jnp.array(grid)))
    ref = F.grid_sample(torch.from_numpy(im.transpose(0, 3, 1, 2).copy()),
                        torch.from_numpy(grid), mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_slab_fast_bf16_matches_clean():
    """s32 pair-packed fast path vs clean slab path in bf16, plus grads."""
    import jax
    import jax.numpy as jnp
    from unibev_tpu.ops.msda import _slab_level, _slab_level_fast

    rng = np.random.RandomState(11)
    BH, H, W, D, Q, P = 4, 13, 17, 8, 50, 3
    value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(BH, Q, P, 2) * 1.2 - 0.1, jnp.float32)
    attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)

    fast = _slab_level_fast(value, H, W, loc, attn)
    clean = _slab_level(value, H, W, loc, attn)
    np.testing.assert_allclose(np.asarray(fast, np.float32),
                               np.asarray(clean, np.float32),
                               atol=0.1, rtol=0.1)

    def loss(v, l, a):
        return jnp.sum(_slab_level_fast(v, H, W, l, a).astype(jnp.float32) ** 2)

    gv, gl, ga = jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)
    for g in (gv, gl, ga):
        assert np.isfinite(np.asarray(g, np.float32)).all()
    assert float(jnp.max(jnp.abs(gv.astype(jnp.float32)))) > 0


def test_slab_custom_bwd_matches_autodiff():
    """The sorted-scatter backward must equal autodiff of the clean slab
    formulation for every input (value, loc, attn)."""
    import jax
    from unibev_tpu.ops.msda import _slab_level, _slab_level_op

    rng = np.random.RandomState(5)
    BH, H, W, D, Q, P = 3, 7, 9, 8, 11, 4
    value = rng.randn(BH, H * W, D).astype(np.float32)
    # include out-of-range and boundary locations
    loc = (rng.rand(BH, Q, P, 2) * 1.4 - 0.2).astype(np.float32)
    attn = rng.rand(BH, Q, P).astype(np.float32)
    g = rng.randn(BH, Q, D).astype(np.float32)

    def f_custom(v, l, a):
        return (_slab_level_op(H, W, v, l, a) * g).sum()

    def f_ref(v, l, a):
        return (_slab_level(v, H, W, l, a) * g).sum()

    gc = jax.grad(f_custom, argnums=(0, 1, 2))(value, loc, attn)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(value, loc, attn)
    for name, a_, b_ in zip(("d_value", "d_loc", "d_attn"), gc, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_slab_custom_bwd_bf16_finite_and_close():
    import jax
    import jax.numpy as jnp
    from unibev_tpu.ops.msda import _slab_level_op

    rng = np.random.RandomState(6)
    BH, H, W, D, Q, P = 2, 6, 6, 8, 9, 4
    value = jnp.asarray(rng.randn(BH, H * W, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(BH, Q, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(BH, Q, P), jnp.bfloat16)

    def f(v, l, a):
        return (_slab_level_op(H, W, v, l, a).astype(jnp.float32) ** 2).sum()

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)
    for t in (gv, gl, ga):
        assert np.isfinite(np.asarray(t, np.float32)).all()


def test_slab_custom_bwd_chunked_matches_autodiff(monkeypatch):
    """Force the Q-chunked backward (>=3 chunks) and check it still equals
    autodiff of the clean slab formulation — the chunk seams must not shift
    geometry, scatter accumulation, or the d_attn/d_loc reassembly."""
    import jax
    import unibev_tpu.ops.msda as msda

    rng = np.random.RandomState(7)
    BH, H, W, D, Q, P = 3, 7, 9, 8, 23, 4
    # budget that yields qc ~ ceil(23/3): row_bytes_per_q = BH*P*4D*4
    monkeypatch.setattr(msda, "BWD_CHUNK_BYTES",
                        float(8 * BH * P * 4 * D * 4))
    value = rng.randn(BH, H * W, D).astype(np.float32)
    loc = (rng.rand(BH, Q, P, 2) * 1.4 - 0.2).astype(np.float32)
    attn = rng.rand(BH, Q, P).astype(np.float32)
    g = rng.randn(BH, Q, D).astype(np.float32)

    def f_custom(v, l, a):
        return (msda._slab_level_op(H, W, v, l, a) * g).sum()

    def f_ref(v, l, a):
        return (msda._slab_level(v, H, W, l, a) * g).sum()

    gc = jax.grad(f_custom, argnums=(0, 1, 2))(value, loc, attn)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(value, loc, attn)
    for name, a_, b_ in zip(("d_value", "d_loc", "d_attn"), gc, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4, err_msg=name)
