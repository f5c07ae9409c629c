"""Per-camera rebatched SCA must equal the masked-dense formulation when the
capacity covers every hit query (it is the same math, only sparsified)."""

import numpy as np
import jax
import jax.numpy as jnp

from unibev_tpu.models.attention.deformable import SpatialCrossAttentionImg


def test_rebatch_equals_dense():
    rng = np.random.RandomState(0)
    B, Q, C, N, Z, V = 1, 64, 32, 3, 2, 30
    query = jnp.array(rng.randn(B, Q, C), jnp.float32)
    value = jnp.array(rng.randn(B, N, V, C), jnp.float32)
    ref = jnp.array(rng.uniform(0, 1, (B, N, Q, Z, 2)), jnp.float32)
    hit = jnp.array(rng.rand(B, N, Q) < 0.4)

    K = Q  # capacity covers everything
    order = jnp.argsort(~hit, axis=-1, stable=True)
    topk = order[..., :K].astype(jnp.int32)

    dense = SpatialCrossAttentionImg(
        embed_dims=C, num_cams=N, rebatch_k=0,
        deformable_attention=dict(embed_dims=C, num_points=4, num_levels=1))
    reb = SpatialCrossAttentionImg(
        embed_dims=C, num_cams=N, rebatch_k=K,
        deformable_attention=dict(embed_dims=C, num_points=4, num_levels=1))

    v1 = dense.init(jax.random.PRNGKey(0), query, value, ref, hit, ((5, 6),))
    out_dense = dense.apply(v1, query, value, ref, hit, ((5, 6),))
    out_reb = reb.apply(v1, query, value, ref, hit, ((5, 6),), topk_idx=topk)
    np.testing.assert_allclose(np.array(out_dense), np.array(out_reb),
                               atol=1e-5, rtol=1e-5)


def test_pallas_smallv_grad_matches_reference():
    """The Pallas SCA kernel must be differentiable (custom VJP) and match
    the jnp twin's gradients — regression for the TPU-only train break."""
    import jax.numpy as jnp
    from unibev_tpu.ops.msda_pallas import (ms_deform_attn_smallv,
                                            _smallv_reference)
    rng = np.random.RandomState(1)
    BH, Q, P, D, H, W = 2, 32, 4, 8, 6, 8
    value = jnp.array(rng.randn(BH, H * W, D), jnp.float32)
    loc = jnp.array(rng.uniform(0, 1, (BH, Q, P, 2)), jnp.float32)
    attn = jax.nn.softmax(jnp.array(rng.randn(BH, Q, P), jnp.float32), -1)

    def f1(v, l, a):
        return ms_deform_attn_smallv(v, (H, W), l, a, q_tile=32,
                                     interpret=True).sum()

    def f2(v, l, a):
        return _smallv_reference(v, (H, W), l, a).sum()

    g1 = jax.grad(f1, argnums=(0, 1, 2))(value, loc, attn)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4)
