"""Hungarian assigner for 3D DETR-style heads (fully in-graph).

Behavioral contract from the reference ``HungarianAssigner3DBEVFormer``
(/root/reference/projects/UniBEV/unibev_plugin/core/bbox/assigners/
hungarian_assigner_3d.py:52-136): cost = focal cls cost + L1 cost over the
first 8 *normalized* box dims, solved exactly; assignment indices are 1-based
in the reference (0 = unassigned) — here we return a boolean mask + gt index
per query instead, which is the natural static-shape formulation.

Padded gt rows (beyond num_valid) never receive queries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from unibev_tpu.core.bbox.lsa import linear_sum_assignment
from unibev_tpu.core.bbox.util import normalize_bbox
from unibev_tpu.registry import BBOX_ASSIGNERS, MATCH_COSTS, build_from_cfg


class AssignResult(NamedTuple):
    # For each query: index of assigned gt (0..G-1), arbitrary where ~mask.
    gt_inds: jnp.ndarray     # (Q,) int32
    pos_mask: jnp.ndarray    # (Q,) bool — query is matched to a valid gt
    # For each gt row: assigned query index (garbage for invalid rows).
    col4row: jnp.ndarray     # (G,) int32


@BBOX_ASSIGNERS.register_module(name="HungarianAssigner3DBEVFormer")
class HungarianAssigner3D:
    def __init__(self, cls_cost=None, reg_cost=None, iou_cost=None, pc_range=None):
        self.cls_cost = build_from_cfg(cls_cost or dict(type="FocalLossCost", weight=2.0),
                                       MATCH_COSTS)
        self.reg_cost = build_from_cfg(reg_cost or dict(type="BBox3DL1CostBEVFormer", weight=0.25),
                                       MATCH_COSTS)
        # iou_cost is a zero-weight placeholder in every reference config.
        self.pc_range = pc_range

    def assign(self, bbox_pred: jnp.ndarray, cls_pred: jnp.ndarray,
               gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
               gt_valid: jnp.ndarray) -> AssignResult:
        """Assign queries to gt boxes.

        Args:
          bbox_pred: (Q, 10) normalized box predictions.
          cls_pred: (Q, num_cls) logits.
          gt_bboxes: (G, 9) raw LiDAR boxes (cx,cy,cz,w,l,h,rot,vx,vy), padded.
          gt_labels: (G,) int labels, padded.
          gt_valid: (G,) bool validity of each gt row.
        """
        G = gt_bboxes.shape[0]
        num_valid = jnp.sum(gt_valid.astype(jnp.int32))
        cls_cost = self.cls_cost(cls_pred, gt_labels)            # (Q, G)
        normalized_gt = normalize_bbox(gt_bboxes)                # (G, 10)
        reg_cost = self.reg_cost(bbox_pred[:, :8], normalized_gt[:, :8])
        cost = (cls_cost + reg_cost).T                           # (G, Q)
        cost = jnp.nan_to_num(cost, nan=1e4, posinf=1e4, neginf=-1e4)
        col4row = linear_sum_assignment(cost, num_valid)         # (G,)

        # Scatter back to per-query targets. Invalid gt rows are redirected to
        # column 0 with zero contribution (additive scatter avoids collisions
        # with a real assignment at column 0). Valid rows always come first
        # (packed-gt convention), matching what linear_sum_assignment solved.
        Q = bbox_pred.shape[0]
        safe_cols = jnp.clip(jnp.where(gt_valid, col4row, 0), 0, Q - 1).astype(jnp.int32)
        valid_i32 = gt_valid.astype(jnp.int32)
        pos_mask = jnp.zeros((Q,), jnp.int32).at[safe_cols].add(valid_i32) > 0
        gt_inds = jnp.zeros((Q,), jnp.int32).at[safe_cols].add(
            valid_i32 * jnp.arange(G, dtype=jnp.int32))
        return AssignResult(gt_inds=gt_inds, pos_mask=pos_mask, col4row=col4row)
