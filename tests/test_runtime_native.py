"""Native host runtime: C++ lib vs python fallbacks (gt check, DBSCAN,
ring conversion, mirror store)."""
import numpy as np
import pytest

from gie_mapping_tpu.runtime import native
from gie_mapping_tpu.runtime.clustering import dbscan_aabb, cloud_to_fence_boxes
from gie_mapping_tpu.runtime.gt_checker import knn_errors
from gie_mapping_tpu.runtime.rings import cloud_to_rings


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ toolchain should be available in this image"


def test_gt_check_matches_scipy(rng):
    occ = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    q = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    from scipy.spatial import cKDTree

    knn, _ = cKDTree(occ).query(q, k=1)
    edt = knn + rng.normal(0, 0.01, len(q)).astype(np.float32)
    rmse, mx, mean_abs = knn_errors(occ, q, edt)
    err = knn - edt
    np.testing.assert_allclose(rmse, np.sqrt((err ** 2).mean()), rtol=1e-4)
    np.testing.assert_allclose(mx, np.abs(err).max(), rtol=1e-4)


def test_dbscan_two_clusters(rng):
    a = rng.normal([0, 0, 1], 0.05, (50, 3))
    b = rng.normal([3, 3, 1], 0.05, (50, 3))
    noise = np.asarray([[10.0, 10.0, 10.0]])
    pts = np.concatenate([a, b, noise]).astype(np.float32)
    boxes = dbscan_aabb(pts)
    assert len(boxes) == 2
    centers = boxes.mean(1)
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0][:2], [0, 0], atol=0.2)
    np.testing.assert_allclose(centers[1][:2], [3, 3], atol=0.2)


def test_fence_boxes_z_clamp(rng):
    pts = rng.normal([0, 0, 1], 0.05, (30, 3)).astype(np.float32)
    boxes = cloud_to_fence_boxes(pts, is_3d=False)
    assert len(boxes) == 1
    ll, ur = boxes[0]
    assert ll[2] == 0.2 and ur[2] == 2.6


def test_cloud_to_rings():
    # one point per ring straight ahead at increasing range
    pts = np.stack([np.arange(1, 17), np.zeros(16), np.zeros(16)], -1).astype(np.float32)
    rings = np.arange(16, dtype=np.int32)
    img, tmin, tinc = cloud_to_rings(pts, rings, ring_num=16, scan_num=360)
    fwd_bin = int(np.floor((0.0 - tmin) / tinc + 0.5)) % 360
    for r in range(16):
        assert img[r, fwd_bin] == r + 1
    assert np.isnan(img[0, (fwd_bin + 90) % 360])


def test_mirror_store_native():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    import ctypes

    h = lib.gie_mirror_new()
    n = 2
    keys = np.asarray([[0, 0, 0], [1, 0, 0]], np.int32)
    occ = np.zeros((n, 512), np.uint8)
    typ = np.zeros((n, 512), np.int8)
    typ[0, 0] = 2  # one occupied voxel at block (0,0,0) corner
    dist = np.full((n, 512), 999999, np.int32)
    dist[1, 7] = 4
    coc = np.zeros((n, 512, 3), np.int16)
    lib.gie_mirror_ingest(
        h,
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        typ.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        coc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n,
    )
    assert lib.gie_mirror_size(h) == 2
    out = np.zeros((10, 3), np.float32)
    cnt = lib.gie_mirror_extract_cloud(
        h, 2, 0.1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 10)
    assert cnt == 1
    np.testing.assert_allclose(out[0], [0, 0, 0])
    pos = np.zeros((10, 3), np.float32)
    d = np.zeros(10, np.float32)
    cnt = lib.gie_mirror_extract_edt(
        h, 999999, 0.1,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 10)
    assert cnt == 1
    np.testing.assert_allclose(d[0], 0.2)  # sqrt(4)*0.1
    lib.gie_mirror_free(h)
