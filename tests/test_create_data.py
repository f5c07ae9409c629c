"""create_data tool on a synthetic mini nuScenes table set."""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def make_tables(root, version="v1.0-mini"):
    os.makedirs(osp.join(root, version), exist_ok=True)
    qI = [1.0, 0.0, 0.0, 0.0]

    sensors = [dict(token="s_lidar", channel="LIDAR_TOP", modality="lidar"),
               dict(token="s_cam", channel="CAM_FRONT", modality="camera")]
    calib = [dict(token="c_lidar", sensor_token="s_lidar", rotation=qI,
                  translation=[0, 0, 1.8], camera_intrinsic=[]),
             dict(token="c_cam", sensor_token="s_cam", rotation=qI,
                  translation=[1.5, 0, 1.5],
                  camera_intrinsic=[[1266, 0, 800], [0, 1266, 450], [0, 0, 1]])]
    ego = [dict(token="e0", rotation=qI, translation=[100.0, 50.0, 0.0],
                timestamp=1000)]
    scenes = [dict(token="sc0", name="scene-0001",
                   first_sample_token="sm0", last_sample_token="sm0")]
    samples = [dict(token="sm0", scene_token="sc0", timestamp=1000,
                    prev="", next="")]
    sample_data = [
        dict(token="sd_l", sample_token="sm0", calibrated_sensor_token="c_lidar",
             ego_pose_token="e0", is_key_frame=True, filename="lidar/0.bin",
             timestamp=1000, prev="", next=""),
        dict(token="sd_c", sample_token="sm0", calibrated_sensor_token="c_cam",
             ego_pose_token="e0", is_key_frame=True, filename="cam/0.jpg",
             timestamp=1000, prev="", next=""),
    ]
    categories = [dict(token="cat0", name="vehicle.car")]
    instances = [dict(token="in0", category_token="cat0")]
    annotations = [dict(token="an0", sample_token="sm0", instance_token="in0",
                        translation=[110.0, 52.0, 1.0], size=[2.0, 4.5, 1.6],
                        rotation=qI, num_lidar_pts=25, num_radar_pts=2,
                        prev="", next="")]
    for name, rows in [("sensor", sensors), ("calibrated_sensor", calib),
                       ("ego_pose", ego), ("scene", scenes),
                       ("sample", samples), ("sample_data", sample_data),
                       ("category", categories), ("instance", instances),
                       ("sample_annotation", annotations)]:
        with open(osp.join(root, version, f"{name}.json"), "w") as f:
            json.dump(rows, f)


@pytest.mark.slow
def test_create_data_nuscenes(tmp_path):
    make_tables(str(tmp_path))
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools/create_data.py"), "nuscenes",
         "--root-path", str(tmp_path), "--version", "v1.0-mini"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    import pickle
    with open(tmp_path / "nuscenes_infos_train.pkl", "rb") as f:
        data = pickle.load(f)
    infos = data["infos"]
    assert len(infos) == 1
    info = infos[0]
    assert info["lidar_path"] == "lidar/0.bin"
    assert "CAM_FRONT" in info["cams"]
    # annotation: global (110, 52, 1) with ego (100, 50, 0), lidar z 1.8:
    # lidar frame center = (10, 2, -0.8); stored z is bottom = -0.8 - h/2
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [10.0, 2.0, -0.8 - 0.8], atol=1e-5)
    np.testing.assert_allclose(box[3:6], [2.0, 4.5, 1.6])
    assert info["gt_names"][0] == "vehicle.car"
    # camera sensor2lidar: both identity rotation; translation cam - lidar
    cam = info["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(cam["sensor2lidar_translation"],
                               [1.5, 0.0, -0.3], atol=1e-6)
