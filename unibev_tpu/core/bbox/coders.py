"""NMS-free top-k box decoding.

Contract from the reference ``NMSFreeCoder`` (/root/reference/projects/UniBEV/
unibev_plugin/core/bbox/coders/nms_free_coder.py:52-121): sigmoid scores over
all (query, class) pairs, flat top-k (max_num=300), label = flat_idx %
num_classes, denormalize, then a post-center-range mask.  The reference's
score-threshold DECAY loop (:64-73 — when nothing clears the threshold it is
relaxed by 0.9x until something does, or fully below 0.01) is reproduced as
a VECTORIZED static ladder of decayed thresholds evaluated in one compare
(strict > at the base threshold, >= on decayed rungs, all-valid fallback
below 0.01); a lax.while_loop version was rejected — 47 ms of sequential
dispatch latency.  Filtering stays a validity mask (static shapes).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from unibev_tpu.core.bbox.util import denormalize_bbox
from unibev_tpu.registry import BBOX_CODERS


@BBOX_CODERS.register_module()
class NMSFreeCoder:
    def __init__(self, pc_range, post_center_range=None, max_num: int = 100,
                 score_threshold: float = None, num_classes: int = 10,
                 voxel_size=None):
        self.pc_range = pc_range
        self.post_center_range = post_center_range
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.num_classes = num_classes

    def decode_single(self, cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """cls_scores: (Q, num_cls) logits; bbox_preds: (Q, 10) normalized.

        Returns dict of fixed-size (max_num, ...) arrays + validity mask.
        """
        scores = jax.nn.sigmoid(cls_scores)
        flat = scores.reshape(-1)
        topk_scores, topk_idx = jax.lax.top_k(flat, self.max_num)
        labels = (topk_idx % self.num_classes).astype(jnp.int32)
        query_idx = topk_idx // self.num_classes
        boxes_norm = bbox_preds[query_idx]
        boxes = denormalize_bbox(boxes_norm)  # (max_num, 9)

        valid = jnp.ones_like(topk_scores, dtype=bool)
        if self.score_threshold is not None:
            # reference decay loop (nms_free_coder.py:64-73): never returns
            # an empty set because of the threshold alone.  The threshold
            # LADDER is static (thr * 0.9^k until < 0.01), so the loop
            # vectorizes into one (max_num, K) compare — a lax.while_loop
            # version measured 47 ms of pure sequential dispatch latency.
            import numpy as np
            ladder = []
            t = np.float32(self.score_threshold)
            while True:
                t = np.float32(t * np.float32(0.9))
                if t < np.float32(0.01):
                    break
                ladder.append(float(t))
            pass0 = topk_scores > self.score_threshold
            if ladder:
                passes = topk_scores[:, None] >= jnp.asarray(
                    ladder, jnp.float32)[None, :]          # (max_num, K)
                anyk = passes.any(axis=0)                  # (K,)
                first_k = jnp.argmax(anyk)
                relaxed = jnp.where(anyk.any(),
                                    passes[:, first_k],
                                    jnp.ones_like(pass0))
            else:
                relaxed = jnp.ones_like(pass0)
            valid &= jnp.where(pass0.any(), pass0, relaxed)
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range, jnp.float32)
            centers = boxes[:, :3]
            valid &= jnp.all(centers >= pcr[:3], axis=1)
            valid &= jnp.all(centers <= pcr[3:], axis=1)

        return dict(bboxes=boxes, scores=topk_scores, labels=labels, valid=valid)

    def decode(self, all_cls_scores: jnp.ndarray, all_bbox_preds: jnp.ndarray):
        """Decode the last decoder layer for every batch element.

        all_cls_scores: (num_layers, B, Q, num_cls); all_bbox_preds likewise.
        """
        cls_scores = all_cls_scores[-1]
        bbox_preds = all_bbox_preds[-1]
        return jax.vmap(self.decode_single)(cls_scores, bbox_preds)
