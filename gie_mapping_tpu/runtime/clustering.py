"""External-observer point-cloud clustering -> AABB obstacle boxes.

Counterpart of the reference's hand-rolled DBSCAN over the `forbid_reg_cloud`
channel (/root/reference/src/volumetric_mapper.cpp:391-496): clusters with
>= 4 points within eps=0.3 m (min 3 neighbours to expand) become axis-aligned
boxes appended to the virtual-fence set; the z extent is clamped to
[0.2, 2.6] unless `is_ext_obsv_3D`.
"""
from __future__ import annotations

import ctypes

import numpy as np

from .native import get_lib

EPS = 0.3
MIN_NBR_PTS = 3
MIN_CLUSTER = 4


def dbscan_aabb(points, eps=EPS, min_pts=MIN_NBR_PTS, min_cluster=MIN_CLUSTER,
                max_boxes=64):
    """Cluster `points` [N,3]; returns boxes [K, 2, 3] (ll, ur)."""
    pts = np.ascontiguousarray(points, np.float32)
    if len(pts) == 0:
        return np.zeros((0, 2, 3), np.float32)

    lib = get_lib()
    if lib is not None:
        out = np.zeros((max_boxes, 6), np.float32)
        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        k = lib.gie_dbscan_aabb(fp(pts), len(pts), float(eps), int(min_pts),
                                int(min_cluster), fp(out), int(max_boxes), None)
        return out[:k].reshape(k, 2, 3)

    # python fallback: grid-hash DBSCAN, identical semantics
    inv = 1.0 / eps
    cells = np.floor(pts * inv).astype(np.int64)
    grid: dict = {}
    for i, c in enumerate(map(tuple, cells)):
        grid.setdefault(c, []).append(i)

    def neighbours(i):
        c = cells[i]
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for j in grid.get((c[0] + dx, c[1] + dy, c[2] + dz), ()):
                        if ((pts[i] - pts[j]) ** 2).sum() <= eps * eps:
                            out.append(j)
        return out

    state = np.zeros(len(pts), np.int8)
    boxes = []
    for i in range(len(pts)):
        if state[i] == 2:
            continue
        seed = [i]
        state[i] = 2
        for j in neighbours(i):
            if j != i:
                seed.append(j)
                state[j] = 1
        k = 1
        while k < len(seed):
            p = seed[k]
            k += 1
            if state[p] == 2:
                continue
            nbrs = neighbours(p)
            if len(nbrs) >= min_pts:
                for j in nbrs:
                    if state[j] == 0:
                        seed.append(j)
                        state[j] = 1
            state[p] = 2
        if len(seed) >= min_cluster:
            cl = pts[seed]
            boxes.append([cl.min(0), cl.max(0)])
            if len(boxes) >= max_boxes:
                break
    if not boxes:
        return np.zeros((0, 2, 3), np.float32)
    return np.asarray(boxes, np.float32)


def cloud_to_fence_boxes(points, is_3d: bool = False):
    """Full external-observer path: cluster + z-clamp
    (volumetric_mapper.cpp:481-493)."""
    boxes = dbscan_aabb(points)
    out = []
    for ll, ur in boxes:
        min_z = ll[2] if is_3d else 0.2
        max_z = ur[2] if is_3d else 2.6
        out.append(([ll[0], ll[1], min_z], [ur[0], ur[1], max_z]))
    return out
