"""nuScenes detection metrics (devkit-free): distance-matched mAP + NDS.

Implements the nuScenes detection score the reference obtains through
``dataset.evaluate`` -> nuscenes-devkit (/root/reference/tools/
test_UniBEV.py:235-245): per-class average precision with center-distance
matching at thresholds {0.5, 1, 2, 4} m (AP integrated over recall 0.1-1 /
precision 0.1-1 region, devkit convention), plus the true-positive errors
(ATE translation, ASE scale, AOE orientation, AVE velocity) and
NDS = (5*mAP + sum(1 - min(1, err))) / 9 (AAE omitted — attributes are not
predicted by UniBEV; its weight is redistributed by using the 4 available TP
errors with weight 1 each over 9 like the devkit does when a metric is
undefined for a class).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0   # devkit computes TP errors at the 2 m threshold


def _center_dist(pred_xy: np.ndarray, gt_xy: np.ndarray) -> np.ndarray:
    return np.linalg.norm(pred_xy[:, None, :] - gt_xy[None, :, :], axis=-1)


def _ap_from_pr(recall: np.ndarray, precision: np.ndarray) -> float:
    """Devkit AP: mean precision over recall in (0.1, 1], precision > 0.1,
    normalized by 0.9 after subtracting the 0.1 floors."""
    if len(recall) == 0:
        return 0.0
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, recall, precision, right=0)
    prec = prec[rec_interp >= 0.1]
    prec = np.maximum(prec - 0.1, 0)
    return float(prec.mean() / 0.9)


def _scale_iou(pred_wlh: np.ndarray, gt_wlh: np.ndarray) -> float:
    mins = np.minimum(pred_wlh, gt_wlh).prod()
    maxs = np.maximum(pred_wlh, gt_wlh).prod()
    return float(mins / max(maxs, 1e-6))


def _yaw_diff(a: float, b: float) -> float:
    d = (a - b) % (2 * np.pi)
    return float(min(d, 2 * np.pi - d))


def evaluate_detections(preds_per_sample: List[Dict],
                        gts_per_sample: List[Dict],
                        class_names: Sequence[str]) -> Dict[str, float]:
    """preds: dicts of boxes (N,9), scores (N,), labels (N,);
    gts: dicts of boxes (M,9), labels (M,)."""
    metrics: Dict[str, float] = {}
    ap_all = []
    tp_errs = {k: [] for k in ("trans_err", "scale_err", "orient_err",
                               "vel_err")}

    for ci, cname in enumerate(class_names):
        # flatten predictions of this class over the dataset
        rows = []   # (score, sample_idx, box)
        n_gt = 0
        for si, (pred, gt) in enumerate(zip(preds_per_sample, gts_per_sample)):
            pm = pred["labels"] == ci
            for s, b in zip(pred["scores"][pm], pred["boxes"][pm]):
                rows.append((float(s), si, b))
            n_gt += int((gt["labels"] == ci).sum())
        if n_gt == 0:
            continue
        rows.sort(key=lambda r: -r[0])

        aps = []
        for thr in DIST_THRESHOLDS:
            matched = [np.zeros((gt["labels"] == ci).sum(), bool)
                       for gt in gts_per_sample]
            tp = np.zeros(len(rows))
            fp = np.zeros(len(rows))
            for ri, (score, si, box) in enumerate(rows):
                gt = gts_per_sample[si]
                gboxes = gt["boxes"][gt["labels"] == ci]
                if len(gboxes) == 0:
                    fp[ri] = 1
                    continue
                d = np.linalg.norm(gboxes[:, :2] - box[:2], axis=-1)
                d[matched[si]] = np.inf
                j = int(np.argmin(d))
                if d[j] < thr:
                    tp[ri] = 1
                    matched[si][j] = True
                    if thr == TP_THRESHOLD:
                        g = gboxes[j]
                        tp_errs["trans_err"].append(float(d[j]))
                        tp_errs["scale_err"].append(1 - _scale_iou(box[3:6], g[3:6]))
                        tp_errs["orient_err"].append(_yaw_diff(box[6], g[6]))
                        tp_errs["vel_err"].append(
                            float(np.linalg.norm(box[7:9] - g[7:9])))
                else:
                    fp[ri] = 1
            ctp = np.cumsum(tp)
            cfp = np.cumsum(fp)
            recall = ctp / n_gt
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            aps.append(_ap_from_pr(recall, precision))
        cls_ap = float(np.mean(aps))
        metrics[f"AP_{cname}"] = cls_ap
        ap_all.append(cls_ap)

    mAP = float(np.mean(ap_all)) if ap_all else 0.0
    metrics["mAP"] = mAP
    tp_scores = []
    for k, vals in tp_errs.items():
        err = float(np.mean(vals)) if vals else 1.0
        metrics[f"m{k}"] = err
        # orientation normalized by pi/2 per devkit? devkit: min(1, err) on
        # the raw error for trans(m)/vel(m/s); scale already in [0,1];
        # orientation in radians capped at 1.
        tp_scores.append(max(0.0, 1.0 - min(1.0, err)))
    metrics["NDS"] = float((5 * mAP + sum(tp_scores)) / (5 + len(tp_scores)))
    return metrics


def nuscenes_eval(results: List[Dict], dataset) -> Dict[str, float]:
    """Adapter from the test-CLI result dicts + NuScenesDataset annotations."""
    preds, gts = [], []
    for i, res in enumerate(results):
        boxes = np.asarray(res["boxes_3d"], np.float32).reshape(-1, 9)
        valid = np.asarray(res.get("valid", [True] * len(boxes)), bool)
        preds.append(dict(boxes=boxes[valid],
                          scores=np.asarray(res["scores_3d"])[valid],
                          labels=np.asarray(res["labels_3d"])[valid]))
        ann = dataset.get_ann_info(i)
        g = np.asarray(ann["gt_bboxes_3d"], np.float32).reshape(-1, 9)
        gts.append(dict(boxes=g, labels=np.asarray(ann["gt_labels_3d"])))
    return evaluate_detections(preds, gts, dataset.classes)
