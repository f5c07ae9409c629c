"""3D box (de)normalization in the UniBEV/BEVFormer regression space.

Semantics match the reference ``core/bbox/util.py`` (/root/reference/projects/
UniBEV/unibev_plugin/core/bbox/util.py:4-53): a LiDAR-frame box
``(cx, cy, cz, w, l, h, rot[, vx, vy])`` maps to the 10-dof normalized layout
``(cx, cy, log w, log l, cz, log h, sin r, cos r[, vx, vy])`` used by both the
L1 loss and the Hungarian match cost.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7 or 9) LiDAR boxes -> (..., 8 or 10) normalized regression targets."""
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(jnp.clip(bboxes[..., 3:4], 1e-5, None))
    l = jnp.log(jnp.clip(bboxes[..., 4:5], 1e-5, None))
    h = jnp.log(jnp.clip(bboxes[..., 5:6], 1e-5, None))
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_bbox`; rotation via atan2(sin, cos)."""
    cx = normalized[..., 0:1]
    cy = normalized[..., 1:2]
    cz = normalized[..., 4:5]
    w = jnp.exp(normalized[..., 2:3])
    l = jnp.exp(normalized[..., 3:4])
    h = jnp.exp(normalized[..., 5:6])
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized.shape[-1] > 8:
        parts += [normalized[..., 8:9], normalized[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)
