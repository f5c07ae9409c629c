"""GridMask image augmentation (train-time), pure-jnp.

Contract from /root/reference/projects/UniBEV/unibev_plugin/models/utils/
grid_mask.py:70-124 with the reference's wiring (use_h, use_w, rotate=1 ->
effective no-op rotation, offset=False, ratio=0.5, mode=1, prob=0.7,
unibev_detector.py:73-75): with prob 0.7 per call, pick a random period
d in [2, H), band width l = clip(int(d*0.5+0.5), 1, d-1) and random phases;
zero the periodic (1-ratio)^2 squares where neither the row nor column band
covers (mode=1 inversion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(x: jnp.ndarray, key: jax.Array, prob: float = 0.7,
              ratio: float = 0.5) -> jnp.ndarray:
    """x: (B, H, W, C) images; one mask draw shared across the batch."""
    B, H, W, C = x.shape
    k_apply, k_d, k_sh, k_sw = jax.random.split(key, 4)
    apply = jax.random.uniform(k_apply) < prob
    d = jax.random.randint(k_d, (), 2, H)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, H)
    st_w = jax.random.randint(k_sw, (), 0, W)
    st_h = st_h % d
    st_w = st_w % d
    rows = ((jnp.arange(H) + d - st_h) % d) < l          # (H,)
    cols = ((jnp.arange(W) + d - st_w) % d) < l          # (W,)
    keep = (rows[:, None] | cols[None, :]).astype(x.dtype)  # 0 on the squares
    keep = jnp.where(apply, keep, jnp.ones_like(keep))
    return x * keep[None, :, :, None]
