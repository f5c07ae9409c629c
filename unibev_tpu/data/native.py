"""ctypes bindings for the native data-loading library (csrc/dataloader.cc).

Auto-builds the .so with g++ on first use if missing; every entry point has a
numpy fallback so the pipeline works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_CSRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                 "csrc")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = osp.join(_CSRC, "libunibev_data.so")
    if not osp.exists(so):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.load_points_bin.restype = ctypes.c_int64
    lib.range_filter_shuffle_pad.restype = ctypes.c_int64
    _LIB = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def load_points_bin(path: str, max_points: int, dim: int = 5) -> np.ndarray:
    lib = _load_lib()
    if lib is None:
        pts = np.fromfile(path, np.float32).reshape(-1, dim)
        return pts[:max_points]
    out = np.empty((max_points, dim), np.float32)
    n = lib.load_points_bin(path.encode(), _ptr(out),
                            ctypes.c_int64(max_points), ctypes.c_int64(dim))
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n]


def transform_points(points: np.ndarray, R: np.ndarray,
                     t: np.ndarray) -> np.ndarray:
    """In-place points[:, :3] = points[:, :3] @ R.T + t; returns points."""
    lib = _load_lib()
    points = np.ascontiguousarray(points, np.float32)
    if lib is None:
        points[:, :3] = points[:, :3] @ np.asarray(R, np.float32).T + t
        return points
    Rr = np.ascontiguousarray(R, np.float32).reshape(9)
    tt = np.ascontiguousarray(t, np.float32).reshape(3)
    lib.transform_points(_ptr(points), ctypes.c_int64(len(points)),
                         ctypes.c_int64(points.shape[1]), _ptr(Rr), _ptr(tt))
    return points


def range_filter_shuffle_pad(points: np.ndarray, pc_range,
                             max_out: int, shuffle: bool = True,
                             seed: int = 0) -> Tuple[np.ndarray, np.ndarray, int]:
    lib = _load_lib()
    points = np.ascontiguousarray(points, np.float32)
    dim = points.shape[1]
    if lib is None:
        r = np.asarray(pc_range, np.float32)
        m = ((points[:, 0] >= r[0]) & (points[:, 0] <= r[3])
             & (points[:, 1] >= r[1]) & (points[:, 1] <= r[4])
             & (points[:, 2] >= r[2]) & (points[:, 2] <= r[5]))
        kept = points[m][:max_out]
        if shuffle:
            kept = kept[np.random.RandomState(seed).permutation(len(kept))]
        out = np.zeros((max_out, dim), np.float32)
        out[:len(kept)] = kept
        mask = np.zeros((max_out,), bool)
        mask[:len(kept)] = True
        return out, mask, len(kept)
    out = np.empty((max_out, dim), np.float32)
    mask = np.empty((max_out,), np.uint8)
    rng = np.ascontiguousarray(pc_range, np.float32)
    n = lib.range_filter_shuffle_pad(
        _ptr(points), ctypes.c_int64(len(points)), ctypes.c_int64(dim),
        _ptr(rng), ctypes.c_int(1 if shuffle else 0), ctypes.c_uint64(seed),
        _ptr(out), _ptr(mask), ctypes.c_int64(max_out))
    return out, mask.astype(bool), int(n)


def normalize_pad_image(img: np.ndarray, mean, std, to_rgb: bool,
                        out_hw: Tuple[int, int]) -> np.ndarray:
    lib = _load_lib()
    H, W = img.shape[:2]
    oh, ow = out_hw
    mean = np.ascontiguousarray(mean, np.float32)
    stdinv = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    if lib is None:
        x = img.astype(np.float32)
        if to_rgb:
            x = x[..., ::-1]
        x = (x - mean) * stdinv
        out = np.zeros((oh, ow, 3), np.float32)
        out[:H, :W] = x
        return out
    out = np.empty((oh, ow, 3), np.float32)
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        lib.normalize_pad_image_u8(
            _ptr(src), ctypes.c_int64(H), ctypes.c_int64(W), _ptr(mean),
            _ptr(stdinv), ctypes.c_int(1 if to_rgb else 0), _ptr(out),
            ctypes.c_int64(oh), ctypes.c_int64(ow))
    else:
        src = np.ascontiguousarray(img, np.float32)
        assert not to_rgb, "f32 path assumes channel order already handled"
        lib.normalize_pad_image_f32(
            _ptr(src), ctypes.c_int64(H), ctypes.c_int64(W), _ptr(mean),
            _ptr(stdinv), _ptr(out), ctypes.c_int64(oh), ctypes.c_int64(ow))
    return out
