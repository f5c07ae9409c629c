"""Voxelizer vs a numpy oracle implementing mmcv hard-voxelization semantics."""

import numpy as np
import jax.numpy as jnp

from unibev_tpu.ops.voxelize import voxelize_and_encode


def numpy_hard_voxelize(points, voxel_size, pc_range, grid_size, max_voxels, max_pts):
    """First-come-first-served hard voxelizer + mean VFE (mmcv semantics)."""
    X, Y, Z = grid_size
    table = {}
    order = []
    for p in points:
        g = np.floor((p[:3] - np.array(pc_range[:3])) / np.array(voxel_size)).astype(int)
        if not (0 <= g[0] < X and 0 <= g[1] < Y and 0 <= g[2] < Z):
            continue
        key = (g[2], g[1], g[0])
        if key not in table:
            if len(order) >= max_voxels:
                continue
            table[key] = []
            order.append(key)
        if len(table[key]) < max_pts:
            table[key].append(p)
    feats = np.stack([np.mean(table[k], axis=0) for k in order]) if order else np.zeros((0, points.shape[1]))
    coords = np.array(order, dtype=np.int32).reshape(-1, 3)
    return feats, coords


def test_voxelize_matches_numpy():
    rng = np.random.RandomState(42)
    P, F = 2000, 5
    pc_range = (-10.0, -10.0, -2.0, 10.0, 10.0, 2.0)
    voxel_size = (0.5, 0.5, 0.5)
    grid_size = (40, 40, 8)
    pts = rng.uniform(-12, 12, size=(P, 3)).astype(np.float32)
    extra = rng.randn(P, F - 3).astype(np.float32)
    points = np.concatenate([pts, extra], axis=1)
    mask = np.ones((P,), bool)
    mask[-100:] = False  # padded rows

    res = voxelize_and_encode(jnp.array(points), jnp.array(mask), voxel_size,
                              pc_range, grid_size, max_voxels=4096,
                              max_points_per_voxel=10)

    ref_feats, ref_coords = numpy_hard_voxelize(
        points[mask], voxel_size, pc_range, grid_size, 4096, 10)

    n = int(res.num_voxels)
    assert n == len(ref_coords)
    # Compare as key->feature maps (our output is sorted by voxel key).
    ours = {tuple(np.array(res.coords)[i]): np.array(res.feats)[i] for i in range(n)}
    theirs = {tuple(c): f for c, f in zip(ref_coords, ref_feats)}
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_allclose(ours[k], theirs[k], atol=1e-4, rtol=1e-4)


def test_voxelize_capacity_truncation():
    rng = np.random.RandomState(0)
    points = rng.uniform(-9, 9, size=(512, 5)).astype(np.float32)
    res = voxelize_and_encode(jnp.array(points), jnp.ones((512,), bool),
                              (0.5, 0.5, 0.5), (-10., -10., -2., 10., 10., 2.),
                              (40, 40, 8), max_voxels=16, max_points_per_voxel=10)
    assert int(res.num_voxels) <= 16
    assert bool(jnp.all(res.num_points <= 10))
