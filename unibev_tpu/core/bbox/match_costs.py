"""Match costs for Hungarian assignment (all pure jnp, mask-aware).

Mirrors the reference's cost terms: ``FocalLossCost`` (mmdet) and
``BBox3DL1CostBEVFormer`` (/root/reference/projects/UniBEV/unibev_plugin/core/
bbox/match_costs/match_cost.py:5-27 — a weighted L1 cdist over the first 8
normalized box dims).
"""

from __future__ import annotations

import jax.numpy as jnp

from unibev_tpu.registry import MATCH_COSTS


@MATCH_COSTS.register_module()
class FocalLossCost:
    """Classification cost used by DETR-style matchers.

    cost[q, g] = pos_cost(q, label_g) - neg_cost(q, label_g) with the focal
    re-weighting, computed from sigmoid scores.
    """

    def __init__(self, weight: float = 1.0, alpha: float = 0.25,
                 gamma: float = 2.0, eps: float = 1e-12):
        self.weight = weight
        self.alpha = alpha
        self.gamma = gamma
        self.eps = eps

    def __call__(self, cls_pred: jnp.ndarray, gt_labels: jnp.ndarray) -> jnp.ndarray:
        """cls_pred: (Q, num_cls) logits; gt_labels: (G,) int -> (Q, G)."""
        p = 1.0 / (1.0 + jnp.exp(-cls_pred))
        neg_cost = -jnp.log1p(-p + self.eps) * p ** self.gamma * (1 - self.alpha)
        pos_cost = -jnp.log(p + self.eps) * (1 - p) ** self.gamma * self.alpha
        diff = pos_cost - neg_cost  # (Q, num_cls)
        cost = jnp.take(diff, gt_labels, axis=1)  # (Q, G)
        return cost * self.weight


@MATCH_COSTS.register_module(name="BBox3DL1CostBEVFormer")
class BBox3DL1Cost:
    """Weighted L1 distance between normalized boxes (first 8 dims)."""

    def __init__(self, weight: float = 1.0):
        self.weight = weight

    def __call__(self, bbox_pred: jnp.ndarray, gt_bboxes: jnp.ndarray) -> jnp.ndarray:
        """bbox_pred: (Q, D) normalized; gt_bboxes: (G, D) normalized -> (Q, G)."""
        cost = jnp.sum(jnp.abs(bbox_pred[:, None, :] - gt_bboxes[None, :, :]), axis=-1)
        return cost * self.weight


@MATCH_COSTS.register_module()
class IoUCost:
    """Fake cost kept for config compatibility (weight 0 in all reference configs)."""

    def __init__(self, weight: float = 0.0, iou_mode: str = "giou"):
        self.weight = weight
        self.iou_mode = iou_mode

    def __call__(self, *args, **kwargs):
        return 0.0
