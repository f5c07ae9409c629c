"""Native C++ dataloader kernels vs numpy references."""

import numpy as np
import pytest

from unibev_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def require_lib():
    if native._load_lib() is None:
        pytest.skip("native library unavailable and no toolchain")


def test_load_points_bin(tmp_path):
    pts = np.random.RandomState(0).randn(1000, 5).astype(np.float32)
    p = tmp_path / "pts.bin"
    pts.tofile(p)
    out = native.load_points_bin(str(p), max_points=2000, dim=5)
    np.testing.assert_array_equal(out, pts)
    capped = native.load_points_bin(str(p), max_points=100, dim=5)
    np.testing.assert_array_equal(capped, pts[:100])


def test_transform_points():
    rng = np.random.RandomState(1)
    pts = rng.randn(500, 5).astype(np.float32)
    R = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    t = rng.randn(3).astype(np.float32)
    expected = pts.copy()
    expected[:, :3] = expected[:, :3] @ R.T + t
    out = native.transform_points(pts.copy(), R, t)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_range_filter_shuffle_pad():
    rng = np.random.RandomState(2)
    pts = (rng.randn(5000, 5) * 40).astype(np.float32)
    pc_range = (-54, -54, -5, 54, 54, 3)
    out, mask, n = native.range_filter_shuffle_pad(pts, pc_range, 4096,
                                                   shuffle=True, seed=7)
    r = np.asarray(pc_range)
    m = ((pts[:, 0] >= r[0]) & (pts[:, 0] <= r[3])
         & (pts[:, 1] >= r[1]) & (pts[:, 1] <= r[4])
         & (pts[:, 2] >= r[2]) & (pts[:, 2] <= r[5]))
    expected_n = min(int(m.sum()), 4096)
    assert n == expected_n
    assert mask.sum() == expected_n
    # same point SET (shuffled order)
    got = {tuple(row) for row in out[:n]}
    ref = {tuple(row) for row in pts[m][:4096]}
    assert got == ref
    assert np.all(out[n:] == 0)


def test_normalize_pad_u8():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (900, 160, 3), np.uint8)
    mean = [103.53, 116.28, 123.675]
    std = [1.0, 1.0, 1.0]
    out = native.normalize_pad_image(img, mean, std, False, (928, 160))
    ref = np.zeros((928, 160, 3), np.float32)
    ref[:900] = img.astype(np.float32) - np.asarray(mean, np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-4)
