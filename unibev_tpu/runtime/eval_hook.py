"""In-training evaluation (mmcv EvalHook analog).

Runs the jitted predict over the val dataset at epoch end and computes the
nuScenes metric (SURVEY §5: EvalHook / val workflow, reference config :417).
Multi-host: each process evaluates its index shard; per-sample results are
packed into fixed-shape arrays and all-gathered, then merged in dataset
order with pad-duplicate samples dropped — the TPU replacement for the
reference's rank0-pickle collect (models/apis/test.py:116-160), which also
truncates the padded tail.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from unibev_tpu.data.eval import evaluate_detections
from unibev_tpu.data.nuscenes_dataset import collate
from unibev_tpu.parallel.dist import process_allgather, shard_indices

_MAX_PRED = 300   # NMSFreeCoder max_num (reference config :377)


def _pack_results(preds: List[dict], gts: List[dict], idxs: np.ndarray,
                  max_gt: int) -> Dict[str, np.ndarray]:
    """Fixed-shape arrays for cross-process allgather.

    ``max_gt`` must be the GLOBAL max GT count (all processes must pack the
    same shapes); the caller derives it via a scalar allgather so crowded
    samples are never silently truncated.
    """
    n = len(preds)
    out = dict(
        idx=np.asarray(idxs[:n], np.int32),
        pred_boxes=np.zeros((n, _MAX_PRED, 9), np.float32),
        pred_scores=np.zeros((n, _MAX_PRED), np.float32),
        pred_labels=np.zeros((n, _MAX_PRED), np.int32),
        pred_n=np.zeros((n,), np.int32),
        gt_boxes=np.zeros((n, max_gt, 9), np.float32),
        gt_labels=np.zeros((n, max_gt), np.int32),
        gt_n=np.zeros((n,), np.int32),
    )
    for i, (p, g) in enumerate(zip(preds, gts)):
        np_, ng = min(len(p["boxes"]), _MAX_PRED), min(len(g["boxes"]), max_gt)
        out["pred_boxes"][i, :np_] = p["boxes"][:np_, :9]
        out["pred_scores"][i, :np_] = p["scores"][:np_]
        out["pred_labels"][i, :np_] = p["labels"][:np_]
        out["pred_n"][i] = np_
        out["gt_boxes"][i, :ng] = np.asarray(g["boxes"],
                                             np.float32).reshape(-1, 9)[:ng]
        out["gt_labels"][i, :ng] = g["labels"][:ng]
        out["gt_n"][i] = ng
    return out


def _unpack_results(gathered: Dict[str, np.ndarray]
                    ) -> Tuple[List[dict], List[dict]]:
    """Merge (possibly multi-host-stacked) packed results in dataset order,
    keeping the first occurrence of every sample index (shard padding
    duplicates samples; the reference's collect_results truncates them)."""
    flat = {k: np.asarray(v) for k, v in gathered.items()}

    # normalize leading dims: allgather stacks a process axis in front
    def norm(a, trailing):
        return a.reshape((-1,) + a.shape[a.ndim - trailing:]) \
            if trailing else a.reshape(-1)
    idx = norm(flat["idx"], 0)
    order = np.argsort(idx, kind="stable")
    seen = set()
    preds, gts = [], []
    pb = norm(flat["pred_boxes"], 2)
    ps = norm(flat["pred_scores"], 1)
    pl = norm(flat["pred_labels"], 1)
    pn = norm(flat["pred_n"], 0)
    gb = norm(flat["gt_boxes"], 2)
    gl = norm(flat["gt_labels"], 1)
    gn = norm(flat["gt_n"], 0)
    for j in order:
        i = int(idx[j])
        if i in seen:
            continue
        seen.add(i)
        k = int(pn[j])
        preds.append(dict(boxes=pb[j, :k], scores=ps[j, :k], labels=pl[j, :k]))
        k = int(gn[j])
        gts.append(dict(boxes=gb[j, :k], labels=gl[j, :k]))
    return preds, gts


def make_eval_fn(model, max_samples: Optional[int] = None,
                 mesh: Optional["jax.sharding.Mesh"] = None):
    """Returns eval_fn(state, dataset) -> metrics dict for Runner.

    Batched + device-sharded + prefetched through the same
    ``runtime.predict`` path as the test CLI (VERDICT r3 #7: the hook used
    to run B=1 on one device while the CLI was batched — at real scale the
    per-epoch eval would have dominated wall-clock).
    """
    from jax.sharding import Mesh
    from unibev_tpu.runtime.predict import (make_replicated_predict,
                                            predict_dataset)

    mesh = mesh or Mesh(np.array(jax.devices()), ("data",))
    predict = make_replicated_predict(model, mesh)

    def _gt_for(dataset, i):
        if hasattr(dataset, "get_ann_info"):
            ann = dataset.get_ann_info(int(i))
            return dict(boxes=np.asarray(ann["gt_bboxes_3d"],
                                         np.float32).reshape(-1, 9),
                        labels=np.asarray(ann["gt_labels_3d"]))
        sample = dataset[int(i)]   # synthetic datasets: GT rides the sample
        g = np.asarray(sample["gt_bboxes"])
        v = np.asarray(sample["gt_valid"])
        return dict(boxes=g[v], labels=np.asarray(sample["gt_labels"])[v])

    def eval_fn(state, dataset) -> Dict[str, float]:
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "constants": state.constants}
        n = len(dataset) if max_samples is None else min(len(dataset),
                                                         max_samples)
        idxs = shard_indices(n, shuffle=False, drop_last=False)
        preds, gts = [], []
        for chunk, _, _, out, row0 in predict_dataset(
                predict, variables, dataset, idxs, mesh, collate):
            for j, i in enumerate(chunk):
                gj = row0 + j
                valid = np.asarray(out["valid"])[gj]
                preds.append(dict(boxes=np.asarray(out["bboxes"])[gj][valid],
                                  scores=np.asarray(out["scores"])[gj][valid],
                                  labels=np.asarray(out["labels"])[gj][valid]))
                gts.append(_gt_for(dataset, i))
        if jax.process_count() > 1:
            local_max = max([len(g["boxes"]) for g in gts] + [1])
            global_max = int(np.max(process_allgather(
                np.asarray([local_max], np.int32))))
            gathered = process_allgather(
                _pack_results(preds, gts, idxs, max_gt=global_max))
            preds, gts = _unpack_results(gathered)
        classes = getattr(dataset, "classes", [str(i) for i in range(10)])
        return evaluate_detections(preds, gts, classes)

    return eval_fn
