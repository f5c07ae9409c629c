"""Radar branch: pcd parsing, multi-sweep loading, pillar encoder, detector."""

import numpy as np
import jax
import jax.numpy as jnp

from unibev_tpu.data.radar import (LoadRadarPointsFromMultiSweeps, RadarPoints,
                                   read_radar_pcd)


def write_pcd(path, pts18):
    n = len(pts18)
    hdr = (f"VERSION 0.7\nFIELDS {' '.join(['x','y','z','dyn_prop','id','rcs','vx','vy','vx_comp','vy_comp','is_quality_valid','ambig_state','x_rms','y_rms','invalid_state','pdh0','vx_rms','vy_rms'])}\n"
           f"SIZE 4 4 4 1 2 4 4 4 4 4 1 1 1 1 1 1 1 1\n"
           f"TYPE F F F I I F F F F F I I I I I I I I\n"
           f"COUNT {' '.join(['1']*18)}\nWIDTH {n}\nHEIGHT 1\n"
           f"VIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n")
    import struct
    with open(path, "wb") as f:
        f.write(hdr.encode())
        for row in pts18:
            f.write(struct.pack("<fff", *row[:3]))
            f.write(struct.pack("<bh", int(row[3]), int(row[4])))
            f.write(struct.pack("<fffff", *row[5:10]))
            f.write(struct.pack("<8b", *[int(v) for v in row[10:18]]))


def test_pcd_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = np.zeros((5, 18), np.float32)
    pts[:, :3] = rng.randn(5, 3)
    pts[:, 5] = rng.rand(5) * 10       # rcs
    pts[:, 8:10] = rng.randn(5, 2)     # compensated velocity
    p = tmp_path / "radar.pcd"
    write_pcd(p, pts)
    out = read_radar_pcd(str(p))
    assert out.shape == (5, 18)
    np.testing.assert_allclose(out[:, :3], pts[:, :3], atol=1e-5)
    np.testing.assert_allclose(out[:, 8:10], pts[:, 8:10], atol=1e-5)


def test_multisweep_loading(tmp_path):
    pts = np.zeros((10, 18), np.float32)
    pts[:, 0] = np.arange(10)
    pts[:, 8] = 1.0  # vx_comp
    p = tmp_path / "r.pcd"
    write_pcd(p, pts)
    ld = LoadRadarPointsFromMultiSweeps(sweeps_num=2, max_num=32)
    res = ld({"radar_info": {"RADAR_FRONT": [dict(
        data_path=str(p),
        sensor2lidar_rotation=np.eye(3), sensor2lidar_translation=np.zeros(3),
        timestamp=0.0)]}, "timestamp": 0.05})
    assert res["radar"].shape == (32, 7)
    assert res["radar_mask"].all()
    # time lag column
    assert np.allclose(res["radar"][:, 6], 0.05)


def test_radar_points_ops():
    t = np.zeros((4, 7), np.float32)
    t[:, 0] = 1.0
    t[:, 3] = 2.0  # vx
    rp = RadarPoints(t, vel_dims=(3, 4)).rotate(np.pi / 2)
    np.testing.assert_allclose(rp.tensor[:, 1], 1.0, atol=1e-6)   # x -> y
    np.testing.assert_allclose(rp.tensor[:, 4], 2.0, atol=1e-6)   # vx -> vy


def test_radar_detector_branch():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_detector import tiny_model_cfg, tiny_batch
    from unibev_tpu.models.detectors.unibev import UniBEV

    cfg = tiny_model_cfg(use_lidar=False, use_camera=True)
    cfg["use_radar"] = True
    cfg["radar_voxel_layer"] = dict(
        max_num_points=8, voxel_size=(1.2, 1.2, 4.0),
        point_cloud_range=(-9.6, -9.6, -2.0, 9.6, 9.6, 2.0),
        max_voxels=(256, 256))
    cfg["radar_voxel_encoder"] = dict(in_channels=7, feat_channels=(32,))
    cfg["radar_middle_encoder"] = dict(in_channels=32, output_shape=(16, 16))
    cfg["pts_backbone"] = dict(in_channels=32, out_channels=(32, 64),
                               layer_nums=(1, 1), layer_strides=(1, 2))
    cfg["pts_neck"] = dict(in_channels=(32, 64), out_channels=(16, 16),
                           upsample_strides=(1, 2))
    model = UniBEV(**cfg)
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng)
    batch["radar"] = jnp.array(rng.uniform(-9, 9, (1, 64, 7)).astype(np.float32))
    batch["radar_mask"] = jnp.ones((1, 64), bool)
    variables = model.init(
        dict(params=jax.random.PRNGKey(0), gridmask=jax.random.PRNGKey(1),
             modality=jax.random.PRNGKey(2), dropout=jax.random.PRNGKey(3)),
        batch, train=False)
    out = model.apply(variables, batch, method=UniBEV.predict)
    assert np.isfinite(np.array(out["bboxes"])).all()
