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
