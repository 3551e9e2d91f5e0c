"""Host-side scroll-frequency simulation of canvas-origin placement policies.

The scroll path dominates the budget-line configs (depthcam steady gated
frame 0.84 ms vs scroll step 4.23 ms, bench_artifacts/
depthcam_frame_parts_20260821_throttled2x.txt), and scroll COUNT is a pure
host-side placement decision (canvas origin is an implementation detail —
window contents are pinned by tests regardless of where the canvas sits).
This sim replays the suite's exact trajectories (bench_suite.case_world_poses
granularity) through the mapper's hysteresis logic under different placement
policies and reports scrolls per loop:

  centered   canvas_geometry today: slack split evenly on both sides
  bias=f     on a forced scroll, move the origin so a fraction f of the
             POSITION slack sits ahead of the motion direction (f=0.5
             reproduces centered; f=1.0 puts all slack ahead)

No TPU needed.  Usage: python examples/sim_scroll_policy.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import load_config
from gie_mapping_tpu.utils.constants import VB_WIDTH


def place(cfg, pvt, motion, bias):
    """Canvas origin for a forced scroll with motion-biased slack."""
    pvt = np.asarray(pvt, np.int64)
    halo = cfg.halo_grids
    cb = np.asarray(cfg.canvas_blocks, np.int64)
    cs = cb * VB_WIDTH
    local = np.asarray(cfg.local_size, np.int64)
    centered = np.floor((pvt + local // 2 - cs // 2) / VB_WIDTH + 0.5).astype(np.int64)
    o_min = -(-(pvt + local + halo - cs) // VB_WIDTH)
    o_max = np.floor_divide(pvt - halo, VB_WIDTH)
    tgt = centered.copy()
    if motion is not None and bias is not None:
        for ax in range(3):
            if motion[ax] > 0:
                # headroom ahead (+ax) grows as origin grows toward o_max
                tgt[ax] = round(centered[ax]
                                + (o_max[ax] - centered[ax]) * (2 * bias - 1))
            elif motion[ax] < 0:
                tgt[ax] = round(centered[ax]
                                + (o_min[ax] - centered[ax]) * (2 * bias - 1))
    return np.clip(tgt, o_min, o_max).astype(np.int32)


def simulate(cfg, poses, bias):
    """Replays _frame_geometry's hysteresis; returns (n_scrolls, shifts)."""
    origin = None
    last_pvt = None
    n_scroll = 0
    shifts = []
    for p in poses:
        pvt = geo.calculate_pivot(np.asarray(p.trans, np.float32),
                                  cfg.voxel_width, cfg.local_size)
        motion = None if last_pvt is None else pvt - last_pvt
        last_pvt = pvt
        if origin is not None:
            off = pvt - origin * VB_WIDTH
            lo_ok = (off >= cfg.halo_grids).all()
            hi_ok = (off + np.asarray(cfg.local_size) + cfg.halo_grids
                     <= np.asarray(cfg.canvas_size)).all()
            if lo_ok and hi_ok:
                continue
        new_origin = place(cfg, pvt, motion, bias)
        if origin is not None:
            n_scroll += 1
            shifts.append(np.abs(new_origin - origin).max())
        origin = new_origin
    return n_scroll, shifts


def main():
    from bench_suite import case_world_poses

    LOOPS = 8  # wind several loops so the closed-wrap scroll is included
    cases = ["scan2D", "ugv_corridor", "cow_lady", "depthcam", "laser3D",
             "uav_raycast_fine"]
    biases = [None, 0.5, 0.65, 0.75, 0.9, 1.0]
    print(f"{'case':<18}" + "".join(
        f"{('centered' if b is None else f'bias={b}'):>12}" for b in biases))
    for case in cases:
        cfg = load_config(case)
        _, poses, n = case_world_poses(cfg, 40 * LOOPS)
        row = f"{case:<18}"
        for b in biases:
            ns, sh = simulate(cfg, poses, b)
            mx = max(sh) if sh else 0
            row += f"{ns:>9}/{mx:<2}"
        print(row + f"   ({n} frames)")


if __name__ == "__main__":
    main()
