#!/usr/bin/env python
"""Generate nuScenes info files (devkit-free).

Replaces ``tools/create_data.py nuscenes`` from mmdet3d (referenced by
/root/reference/docs/prepare_dataset.md:3-5): reads the raw nuScenes JSON
tables (v1.0-*/{sample,sample_data,calibrated_sensor,ego_pose,scene,
sample_annotation,instance,category,attribute}.json) directly and writes
train/val info pickles in the mmdet3d v0.18 schema our NuScenesDataset
consumes.

Usage:
  python tools/create_data.py nuscenes --root-path data/nuscenes \
      --version v1.0-trainval --out-dir data/nuscenes
"""

import argparse
import json
import os.path as osp
import pickle
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# Official train/val scene split sizes are defined by scene name lists in the
# devkit; without it we split by scene index parity of the published lists.
# For v1.0-mini the two splits below match the devkit's mini_train/mini_val.
MINI_VAL_SCENES = {"scene-0103", "scene-0916"}

CAM_NAMES = ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT", "CAM_BACK",
             "CAM_BACK_LEFT", "CAM_BACK_RIGHT")


def quaternion_to_rotation(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def load_table(root, version, name):
    with open(osp.join(root, version, f"{name}.json")) as f:
        rows = json.load(f)
    return {r["token"]: r for r in rows}, rows


def sensor_to_other(calib_a, ego_a, calib_b, ego_b):
    """R, t mapping sensor A frame -> sensor B frame via global."""
    Ra = quaternion_to_rotation(calib_a["rotation"])
    Rea = quaternion_to_rotation(ego_a["rotation"])
    Rb = quaternion_to_rotation(calib_b["rotation"])
    Reb = quaternion_to_rotation(ego_b["rotation"])
    R = Rb.T @ Reb.T @ Rea @ Ra
    t = np.asarray(calib_a["translation"])
    t = Rea @ t + np.asarray(ego_a["translation"])
    t = Reb.T @ (t - np.asarray(ego_b["translation"]))
    t = Rb.T @ (t - np.asarray(calib_b["translation"]))
    return R, t


def _ann_velocity(ann, ann_t, sample_t, max_time_diff=1.5):
    """devkit NuScenes.box_velocity: (pos_next - pos_prev) / dt in the global
    frame using the neighboring keyframe annotations of the same instance;
    zeros when no neighbor exists or the gap exceeds max_time_diff."""
    has_prev = bool(ann.get("prev"))
    has_next = bool(ann.get("next"))
    if not has_prev and not has_next:
        return np.zeros(3)
    first = ann_t[ann["prev"]] if has_prev else ann
    last = ann_t[ann["next"]] if has_next else ann
    pos_first = np.asarray(first["translation"])
    pos_last = np.asarray(last["translation"])
    t_first = sample_t[first["sample_token"]]["timestamp"] / 1e6
    t_last = sample_t[last["sample_token"]]["timestamp"] / 1e6
    dt = t_last - t_first
    if dt > max_time_diff or dt <= 0:
        return np.zeros(3)
    v = (pos_last - pos_first) / dt
    return np.nan_to_num(v)


def build_infos(root, version, max_sweeps=10):
    sample_t, samples = load_table(root, version, "sample")
    sd_t, sds = load_table(root, version, "sample_data")
    calib_t, _ = load_table(root, version, "calibrated_sensor")
    ego_t, _ = load_table(root, version, "ego_pose")
    scene_t, scenes = load_table(root, version, "scene")
    sensor_t, _ = load_table(root, version, "sensor")
    ann_t, anns = load_table(root, version, "sample_annotation")
    inst_t, _ = load_table(root, version, "instance")
    cat_t, _ = load_table(root, version, "category")
    try:
        attr_t, _ = load_table(root, version, "attribute")
    except FileNotFoundError:
        attr_t = {}

    sd_by_sample = defaultdict(list)
    for r in sds:
        sd_by_sample[r["sample_token"]].append(r)
    ann_by_sample = defaultdict(list)
    for r in anns:
        ann_by_sample[r["sample_token"]].append(r)

    infos = []
    for sample in samples:
        lidar_sd = None
        cams = {}
        for sd in sd_by_sample[sample["token"]]:
            if not sd["is_key_frame"]:
                continue
            channel = sensor_t[calib_t[sd["calibrated_sensor_token"]]
                               ["sensor_token"]]["channel"]
            if channel == "LIDAR_TOP":
                lidar_sd = sd
            elif channel in CAM_NAMES:
                cams[channel] = sd
        if lidar_sd is None:
            continue
        l_calib = calib_t[lidar_sd["calibrated_sensor_token"]]
        l_ego = ego_t[lidar_sd["ego_pose_token"]]

        cam_infos = {}
        for name, sd in cams.items():
            c_calib = calib_t[sd["calibrated_sensor_token"]]
            c_ego = ego_t[sd["ego_pose_token"]]
            # camera sensor -> lidar sensor
            R, t = sensor_to_other(c_calib, c_ego, l_calib, l_ego)
            cam_infos[name] = dict(
                data_path=sd["filename"],
                type=name,
                sample_data_token=sd["token"],
                cam_intrinsic=np.asarray(c_calib["camera_intrinsic"]),
                sensor2lidar_rotation=R,
                sensor2lidar_translation=t,
                timestamp=sd["timestamp"],
            )

        # previous lidar sweeps
        sweeps = []
        cur = lidar_sd
        while len(sweeps) < max_sweeps and cur["prev"]:
            cur = sd_t[cur["prev"]]
            s_calib = calib_t[cur["calibrated_sensor_token"]]
            s_ego = ego_t[cur["ego_pose_token"]]
            R, t = sensor_to_other(s_calib, s_ego, l_calib, l_ego)
            sweeps.append(dict(
                data_path=cur["filename"],
                sample_data_token=cur["token"],
                sensor2lidar_rotation=R,
                sensor2lidar_translation=t,
                timestamp=cur["timestamp"] / 1e6,
            ))

        # annotations in the lidar frame
        gt_boxes, gt_names, gt_velocity, gt_attrs = [], [], [], []
        num_lidar_pts, num_radar_pts = [], []
        Rl = quaternion_to_rotation(l_calib["rotation"])
        Rle = quaternion_to_rotation(l_ego["rotation"])
        for ann in ann_by_sample[sample["token"]]:
            cat = cat_t[inst_t[ann["instance_token"]]["category_token"]]["name"]
            center = np.asarray(ann["translation"])
            xe = Rle.T @ (center - np.asarray(l_ego["translation"]))
            xl = Rl.T @ (xe - np.asarray(l_calib["translation"]))
            Rbox = quaternion_to_rotation(ann["rotation"])
            Rbox_l = Rl.T @ Rle.T @ Rbox
            yaw = np.arctan2(Rbox_l[1, 0], Rbox_l[0, 0])
            w, l, h = ann["size"]
            # mmdet3d LiDAR box convention: (x, y, z_bottom, w_x=l?, ...)
            # v0.18 gt_boxes layout: (cx, cy, cz_bottom, w, l, h, yaw)
            gt_boxes.append([xl[0], xl[1], xl[2] - h / 2, w, l, h, yaw])
            gt_names.append(cat)
            # devkit box_velocity: central difference over neighboring
            # keyframe annotations of the same instance (<= 0.5 s apart each
            # side), in the GLOBAL frame, rotated into lidar; nan -> 0
            # (mmdet3d convention).
            v_global = _ann_velocity(ann, ann_t, sample_t)
            v_l = Rl.T @ (Rle.T @ v_global)
            gt_velocity.append([v_l[0], v_l[1]])
            toks = ann.get("attribute_tokens", [])
            gt_attrs.append(attr_t[toks[0]]["name"]
                            if toks and toks[0] in attr_t else "")
            num_lidar_pts.append(ann.get("num_lidar_pts", 1))
            num_radar_pts.append(ann.get("num_radar_pts", 0))

        infos.append(dict(
            token=sample["token"],
            lidar_path=lidar_sd["filename"],
            sweeps=sweeps,
            cams=cam_infos,
            scene_token=sample["scene_token"],
            timestamp=sample["timestamp"],
            # lidar sensor -> ego frame (devkit center-dist range filtering
            # measures from the ego pose, not the lidar origin)
            lidar2ego_rotation=Rl,
            lidar2ego_translation=np.asarray(l_calib["translation"],
                                             np.float64),
            gt_boxes=np.asarray(gt_boxes, np.float32).reshape(-1, 7),
            gt_names=gt_names,
            gt_velocity=np.asarray(gt_velocity, np.float32).reshape(-1, 2),
            gt_attrs=gt_attrs,
            num_lidar_pts=np.asarray(num_lidar_pts, np.int64),
            num_radar_pts=np.asarray(num_radar_pts, np.int64),
            valid_flag=np.asarray(num_lidar_pts, np.int64) > 0,
        ))

    scene_name = {s["token"]: s["name"] for s in scenes}
    train = [i for i in infos
             if scene_name[i["scene_token"]] not in MINI_VAL_SCENES]
    val = [i for i in infos
           if scene_name[i["scene_token"]] in MINI_VAL_SCENES]
    if not val:   # full split: fall back to a ~85/15 scene split
        names = sorted({scene_name[i["scene_token"]] for i in infos})
        val_names = set(names[6::7]) if len(names) > 1 else set()
        train = [i for i in infos
                 if scene_name[i["scene_token"]] not in val_names]
        val = [i for i in infos if scene_name[i["scene_token"]] in val_names]
    return train, val


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["nuscenes"])
    p.add_argument("--root-path", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--max-sweeps", type=int, default=10)
    args = p.parse_args()
    out_dir = args.out_dir or args.root_path

    train, val = build_infos(args.root_path, args.version, args.max_sweeps)
    for split, infos in (("train", train), ("val", val)):
        path = osp.join(out_dir, f"nuscenes_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(dict(infos=infos,
                             metadata=dict(version=args.version)), f)
        print(f"wrote {len(infos)} infos to {path}")


if __name__ == "__main__":
    main()
