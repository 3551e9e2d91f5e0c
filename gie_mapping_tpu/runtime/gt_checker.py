"""Online EDT ground-truth checker.

Counterpart of the reference's Gnd_truth_checker
(/root/reference/include/gt_checker.h:13-88): brute-force 1-NN distances from
the published occupied cloud are compared against the engine's EDT values;
RMSE / max error accumulate and print every 10 checks.  The 1-NN search runs
in the native C++ KD-tree when available, else scipy's cKDTree.
"""
from __future__ import annotations

import ctypes

import numpy as np

from .native import get_lib


def knn_errors(occupied_pts, query_pts, edt_dists_m):
    """(rmse, max_err, mean_abs) of edt_dists_m vs exact 1-NN distances."""
    occupied_pts = np.ascontiguousarray(occupied_pts, np.float32)
    query_pts = np.ascontiguousarray(query_pts, np.float32)
    edt = np.ascontiguousarray(edt_dists_m, np.float32)
    if len(occupied_pts) == 0 or len(query_pts) == 0:
        return -1.0, -1.0, -1.0

    lib = get_lib()
    if lib is not None:
        out = np.zeros(3, np.float32)
        fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        lib.gie_gt_check(fp(occupied_pts), len(occupied_pts), fp(query_pts),
                         len(query_pts), fp(edt), fp(out))
        return float(out[0]), float(out[1]), float(out[2])

    from scipy.spatial import cKDTree

    tree = cKDTree(occupied_pts)
    knn, _ = tree.query(query_pts, k=1)
    err = knn - edt
    return (float(np.sqrt(np.mean(err ** 2))), float(np.abs(err).max()),
            float(np.abs(err).mean()))


class GroundTruthChecker:
    """Accumulating checker with the reference's every-10-frames reporting
    cadence (gt_checker.h:67-76)."""

    def __init__(self, report_every: int = 10):
        self.report_every = report_every
        self.rms_sum = 0.0
        self.rms_cnt = 0
        self.last = None
        self.last_global = None

    def check_frame(self, out, voxel_width: float, logger=None):
        """Compare one FrameOutput's window EDT against 1-NN ground truth."""
        from ..utils.constants import VOX_OCCUPIED, VOX_UNKNOWN

        types = out.glb_type
        occ_idx = np.argwhere(types == VOX_OCCUPIED)
        valid = (types != VOX_UNKNOWN) & (out.dist_sq < 900000)
        q_idx = np.argwhere(valid)
        if len(occ_idx) == 0 or len(q_idx) == 0:
            return None
        occ_pts = (occ_idx + out.pvt) * voxel_width
        q_pts = (q_idx + out.pvt) * voxel_width
        edt_m = out.edt[valid] * voxel_width
        rmse, mx, mean_abs = knn_errors(occ_pts, q_pts, edt_m)
        self.last = (rmse, mx, mean_abs)
        if rmse >= 0:
            self.rms_sum += rmse
            self.rms_cnt += 1
            if self.rms_cnt >= self.report_every:
                avg = self.rms_sum / self.rms_cnt
                print(f"max_error is {mx:.6f},  rms_err is {avg:.6f}")
                self.rms_sum = 0.0
                self.rms_cnt = 0
        if logger is not None:
            logger.log_rmse(rmse)
        return self.last

    def check_global(self, mirror, voxel_width: float, logger=None):
        """profile_glb_rms: 1-NN check of the streamed GLOBAL map — the host
        mirror's EDT cloud against its own occupied cloud.

        Counterpart of the reference's profiling tick over the published
        global clouds (include/volumetric_mapper.h:320-356 driving
        publish_glb_2_rviz, :246-317): where check_frame validates only the
        local window, this validates what consumers actually receive through
        the streaming pipeline — a corrupted/stale streamed block shows up
        here and nowhere else.  When both profile flags are on, the global
        RMSE is the one recorded in the CSV column (logged last)."""
        occ_pts = mirror.occupied_cloud(voxel_width)
        q_pts, edt_m = mirror.edt_cloud(voxel_width)
        if len(occ_pts) == 0 or len(q_pts) == 0:
            return None
        rmse, mx, mean_abs = knn_errors(occ_pts, q_pts, edt_m)
        self.last_global = (rmse, mx, mean_abs)
        if logger is not None and rmse >= 0:
            logger.log_rmse(rmse)
        return self.last_global
