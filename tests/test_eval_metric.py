"""Hand-computed fixtures for the devkit-exact nuScenes metric (data/eval.py).

Each test pins one devkit formula (VERDICT r1 #3): AP normalization, the
recall-capped TP means, scale_iou, barrier orientation period, class-range
filtering, per-class TP exclusions, attribute error, NDS assembly.
"""

import numpy as np
import pytest

from unibev_tpu.data.eval import (CLASS_RANGE, accumulate, angle_diff,
                                  calc_ap, calc_tp, cummean,
                                  default_attribute, evaluate_detections,
                                  scale_iou)


def box(x, y, wlh=(2, 2, 2), yaw=0.0, vxy=(0, 0), z=0.0):
    return [x, y, z, wlh[0], wlh[1], wlh[2], yaw, vxy[0], vxy[1]]


def sample(boxes, labels, scores=None, attrs=None):
    d = dict(boxes=np.asarray(boxes, np.float32).reshape(-1, 9),
             labels=np.asarray(labels))
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    if attrs is not None:
        d["attrs"] = np.asarray(attrs, object)
    return d


# ---------------------------------------------------------------- primitives

def test_scale_iou_devkit_formula():
    # intersection of min dims over UNION (not max product):
    # (1,1,1) vs (2,2,2): inter 1, union 8 + 1 - 1 = 8
    assert scale_iou((1, 1, 1), (2, 2, 2)) == pytest.approx(1 / 8)
    assert scale_iou((2, 2, 2), (2, 2, 2)) == pytest.approx(1.0)
    # asymmetric dims: (1,2,3) vs (3,2,1): inter 1*2*1=2, union 6+6-2=10
    assert scale_iou((1, 2, 3), (3, 2, 1)) == pytest.approx(0.2)


def test_angle_diff_periods():
    assert angle_diff(0.0, np.pi, 2 * np.pi) == pytest.approx(np.pi)
    # barrier period pi: a flip is a perfect orientation match
    assert angle_diff(0.0, np.pi, np.pi) == pytest.approx(0.0)
    assert angle_diff(0.1, -0.1, 2 * np.pi) == pytest.approx(0.2)
    assert angle_diff(np.pi - 0.05, -np.pi + 0.05, 2 * np.pi) == \
        pytest.approx(0.1)


def test_cummean_nan_aware():
    np.testing.assert_allclose(cummean(np.array([1.0, np.nan, 3.0])),
                               [1.0, 1.0, 2.0])
    np.testing.assert_allclose(cummean(np.array([np.nan, np.nan])), [1.0, 1.0])


def test_default_attribute_speed_rule():
    assert default_attribute("car", (1.0, 0)) == "vehicle.moving"
    assert default_attribute("car", (0.1, 0)) == "vehicle.parked"
    assert default_attribute("bicycle", (1.0, 0)) == "cycle.with_rider"
    assert default_attribute("pedestrian", (0.0, 0)) == "pedestrian.standing"
    assert default_attribute("pedestrian", (1.0, 0)) == "pedestrian.moving"
    assert default_attribute("bus", (0.0, 0)) == "vehicle.stopped"
    assert default_attribute("barrier", (0.0, 0)) == ""


# ------------------------------------------------------------------- AP math

def test_ap_half_recall_hand_computed():
    # 2 GTs, ONE perfect pred: recall plateau at 0.5 with precision 1.
    # prec curve = 1 for grid<=0.5 (indices 0..50), 0 beyond (right=0).
    # AP = mean(max(prec[11:]-0.1, 0)) / 0.9 = (40 * 0.9) / 90 / 0.9 = 4/9.
    gts = [sample([box(0, 0), box(10, 0)], [0, 0])]
    preds = [sample([box(0, 0)], [0], scores=[0.9])]
    md = accumulate(preds, gts, 0, "car", 2.0)
    assert calc_ap(md) == pytest.approx(4 / 9)


def test_ap_perfect_is_one_and_zero_when_far():
    gts = [sample([box(0, 0)], [0])]
    md = accumulate([sample([box(0, 0)], [0], scores=[0.9])], gts, 0, "car", 2.0)
    assert calc_ap(md) == pytest.approx(1.0)
    md = accumulate([sample([box(30, 0)], [0], scores=[0.9])], gts, 0, "car", 2.0)
    assert calc_ap(md) == pytest.approx(0.0)


def test_greedy_match_uses_score_order_and_taken_set():
    # one GT, two preds both within threshold: high-score one matches (TP),
    # the second is a duplicate FP.
    gts = [sample([box(0, 0)], [0])]
    preds = [sample([box(0.5, 0), box(0.1, 0)], [0, 0], scores=[0.9, 0.5])]
    md = accumulate(preds, gts, 0, "car", 2.0)
    # match list has exactly one entry with trans_err 0.5 (the 0.9 pred)
    assert md.errs["trans_err"][11] == pytest.approx(0.5)
    # precision at full recall (index 100): conf cutoff keeps it 1/1 until
    # the FP enters: cumulative prec = [1, 0.5]
    assert calc_ap(md) < 1.0


# -------------------------------------------------------- TP err recall caps

def test_tp_err_mean_capped_at_max_recall():
    # 2 GTs, one TP (recall 0.5, trans_err 0.5): conf curve is nonzero only
    # up to grid index 50 -> calc_tp averages errs[11:51] == 0.5 exactly.
    gts = [sample([box(0, 0), box(10, 0)], [0, 0])]
    preds = [sample([box(0.5, 0)], [0], scores=[0.9])]
    md = accumulate(preds, gts, 0, "car", 2.0)
    assert md.max_recall_ind == 50
    assert calc_tp(md, "trans_err") == pytest.approx(0.5)


def test_tp_err_is_one_when_recall_below_min():
    # 20 GTs, one TP: max recall 0.05 < 0.1 -> devkit returns 1.0
    gts = [sample([box(10 * i, 0) for i in range(20)], [0] * 20)]
    preds = [sample([box(0, 0)], [0], scores=[0.9])]
    md = accumulate(preds, gts, 0, "car", 2.0)
    assert calc_tp(md, "trans_err") == 1.0


def test_tp_err_cummean_conf_resampling():
    # two TPs with errs 0.2 (score .9) and 0.6 (score .5): cumulative means
    # are [0.2, 0.4]; recall grid: first half of the grid (conf >= .9) sees
    # 0.2, the second (conf .5) sees 0.4; calc_tp over [11:101] mixes them.
    gts = [sample([box(0, 0), box(10, 0)], [0, 0])]
    preds = [sample([box(0.2, 0), box(10.6, 0)], [0, 0], scores=[0.9, 0.5])]
    md = accumulate(preds, gts, 0, "car", 2.0)
    # errs at low recall (index 11, conf .9) -> 0.2; at full recall -> 0.4
    assert md.errs["trans_err"][11] == pytest.approx(0.2)
    assert md.errs["trans_err"][100] == pytest.approx(0.4)
    got = calc_tp(md, "trans_err")
    assert 0.2 < got < 0.4


# --------------------------------------------------------- filtering & flags

def test_class_range_filter():
    assert CLASS_RANGE["car"] == 50.0 and CLASS_RANGE["traffic_cone"] == 30.0
    # car GT at 55 m: filtered out of GT -> class has no GTs -> skipped
    gts = [sample([box(55, 0)], [0])]
    preds = [sample([box(55, 0)], [0], scores=[0.9])]
    m = evaluate_detections(preds, gts, ["car"])
    assert "AP_car" not in m and m["mAP"] == 0.0
    # traffic_cone pred at 35 m filtered; GT at 10 m stays -> AP 0
    classes = ["car", "traffic_cone"]
    gts = [sample([box(10, 0)], [1])]
    preds = [sample([box(35, 0), box(10, 0)], [1, 1], scores=[0.9, 0.8])]
    m_in = evaluate_detections(preds, gts, classes)
    preds_far_only = [sample([box(35, 0)], [1], scores=[0.9])]
    m_out = evaluate_detections(preds_far_only, gts, classes)
    assert m_in["AP_traffic_cone"] > 0 and m_out["AP_traffic_cone"] == 0.0


def test_gt_zero_point_filter():
    gts = [dict(boxes=np.asarray([box(0, 0), box(10, 0)], np.float32),
                labels=np.array([0, 0]), num_pts=np.array([5, 0]))]
    preds = [sample([box(0, 0)], [0], scores=[0.9])]
    m = evaluate_detections(preds, gts, ["car"])
    # the 0-point GT is dropped -> single GT, perfect AP
    assert m["AP_car"] == pytest.approx(1.0)


def test_class_tp_exclusions_nan():
    # traffic_cone: orient/vel/attr undefined -> with only cones those
    # metrics are nan and NDS drops them from numerator AND denominator
    gts = [sample([box(0, 0)], [0])]
    preds = [sample([box(0, 0)], [0], scores=[0.9])]
    m = evaluate_detections(preds, gts, ["traffic_cone"])
    assert np.isnan(m["morient_err"]) and np.isnan(m["mvel_err"])
    assert m["mtrans_err"] == pytest.approx(0.0)
    # NDS = (5*1 + (1-ATE) + (1-ASE)) / 7
    assert m["NDS"] == pytest.approx((5 + 2) / 7)


def test_barrier_period_in_orientation_error():
    gts = [sample([box(0, 0, yaw=0.0)], [0])]
    preds = [sample([box(0, 0, yaw=np.pi)], [0], scores=[0.9])]
    m_bar = evaluate_detections(preds, gts, ["barrier"])
    m_car = evaluate_detections(preds, gts, ["car"])
    assert m_bar["morient_err"] == pytest.approx(0.0, abs=1e-6)
    assert m_car["morient_err"] == pytest.approx(np.pi, abs=1e-6)


# -------------------------------------------------------------- AAE and NDS

def test_attribute_error():
    gts = [sample([box(0, 0), box(10, 0)], [0, 0],
                  attrs=["vehicle.moving", "vehicle.parked"])]
    preds = [sample([box(0, 0), box(10, 0)], [0, 0], scores=[0.9, 0.8],
                    attrs=["vehicle.moving", "vehicle.moving"])]
    m = evaluate_detections(preds, gts, ["car"])
    # devkit: attr errs per match [0, 1] -> cummean [0, 0.5]; resampled onto
    # the recall grid via confidence the curve is 0 for recall <= 0.5 and a
    # linear ramp to 0.5 at recall 1; the recall-[0.11, 1.0] mean of
    # max(0, g - 0.5) over g in {0.11..1.00} is 12.75/90.
    assert m["mattr_err"] == pytest.approx(12.75 / 90)
    # without GT attrs the metric is undefined -> nan, NDS over 9
    preds2 = [dict(boxes=preds[0]["boxes"], scores=preds[0]["scores"],
                   labels=preds[0]["labels"])]
    gts2 = [dict(boxes=gts[0]["boxes"], labels=gts[0]["labels"])]
    m2 = evaluate_detections(preds2, gts2, ["car"])
    assert np.isnan(m2["mattr_err"])
    assert m2["NDS"] == pytest.approx((5 * 1 + 4) / 9)


def test_nds_full_assembly():
    # perfect predictions with attrs: NDS = (5*1 + 5*1)/10 = 1
    gts = [sample([box(0, 0, vxy=(1, 0))], [0], attrs=["vehicle.moving"])]
    preds = [sample([box(0, 0, vxy=(1, 0))], [0], scores=[0.9],
                    attrs=["vehicle.moving"])]
    m = evaluate_detections(preds, gts, ["car"])
    assert m["NDS"] == pytest.approx(1.0)
    assert m["mAP"] == pytest.approx(1.0)
    for k in ("mtrans_err", "mscale_err", "morient_err", "mvel_err",
              "mattr_err"):
        assert m[k] == pytest.approx(0.0)
