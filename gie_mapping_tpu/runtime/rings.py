"""Multi-ring LiDAR PointCloud -> range-ring image conversion.

Counterpart of the reference's CPU cloud->rings pass
(/root/reference/src/vlp16_map_maker.cpp:73-148): each point with a `ring`
index is binned by azimuth into a [ring_num, scan_num] horizontal-range
image consumed by the spherical-projection sensor model.  Runs in native C++
when available.
"""
from __future__ import annotations

import ctypes

import numpy as np

from .native import get_lib


def cloud_to_rings(points, rings, ring_num=16, scan_num=360,
                   theta_min=-np.pi, theta_inc=None):
    """points [N,3] float32 (sensor frame), rings [N] int ring index.

    Returns (rings_img [ring_num, scan_num] float32 horizontal ranges with
    NaN for empty bins, theta_min, theta_inc)."""
    if theta_inc is None:
        theta_inc = 2 * np.pi / scan_num
    pts = np.ascontiguousarray(points, np.float32)
    rg = np.ascontiguousarray(rings, np.int32)

    lib = get_lib()
    if lib is not None:
        img = np.empty((ring_num, scan_num), np.float32)
        lib.gie_cloud_to_rings(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(pts), int(ring_num), int(scan_num),
            float(theta_min), float(theta_inc),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return img, theta_min, theta_inc

    img = np.full((ring_num, scan_num), np.nan, np.float32)
    theta = np.arctan2(pts[:, 1], pts[:, 0])
    t = np.floor((theta - theta_min) / theta_inc + 0.5).astype(np.int64) % scan_num
    rng = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    for i in range(len(pts)):
        r = rg[i]
        if 0 <= r < ring_num:
            cur = img[r, t[i]]
            if np.isnan(cur) or rng[i] < cur:
                img[r, t[i]] = rng[i]
    return img, theta_min, theta_inc
