"""Design probe for the change-gated canvas EDT (round 3).

Measures, on the bench workloads (CPU), the per-frame AFFECTED-REGION slab
the gated EDT would recompute: the bounding box of

    site_flips  ∪  became_observed  ∪  { v observed : box_dist_sq(v, Δboxes)
                                                       <= state.dist_sq(v) }

where Δboxes = bbox(site flips) plus the entering slabs on scroll frames.
Every voxel whose exact canvas EDT (or any downstream merge select) can
change this frame lies inside the slab (see models/pipeline.py gated-EDT
notes), so slab-extent / canvas-extent per axis bounds the achievable
traffic cut of lane-sliced phase-2/3 envelopes.

Usage: python examples/probe_gate_slab.py [cow_lady|depthcam] [n_frames]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import load_config
    from gie_mapping_tpu.utils.constants import VOX_OCCUPIED, VOX_UNKNOWN

    case = sys.argv[1] if len(sys.argv) > 1 else "cow_lady"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                     display_loc_edt=False, display_loc_ogm=False)
    if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        overrides.update(max_raycast_points=4096, fuse_raycast=False)
    cfg = load_config(case, **overrides)

    extent = min(cfg.local_size_m[0] * 0.45, 4.5)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=extent,
                              height=max(cfg.local_size_m[2], 2.5))
    poses = circular_trajectory(n_frames=n_frames, radius=extent * 0.35,
                                height=cfg.local_size_m[2] * 0.4)

    mapper = VolumetricMapper(cfg)
    cs = np.asarray(cfg.canvas_size)
    X, Y, Z = cs
    print(f"case={case} canvas={tuple(cs)} window={cfg.local_size} "
          f"halo={cfg.halo_grids} fast_mode={cfg.fast_mode}")

    def feed(i):
        p = poses[i]
        if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
            pc = world.pointcloud(p, n_rays=4096, max_range=8.0, seed=i)
            return mapper.process_pointcloud(p, pc)
        if case == "depthcam":
            img, fx, fy, cx, cy = world.depth_image(
                p, rows=96, cols=128, fx=80.0, fy=80.0, max_range=6.0)
            return mapper.process_depth(p, img, fx, fy, cx, cy)
        if case == "scan2D":
            r, tmin, tinc = world.scan_2d(p, n_beams=720)
            return mapper.process_scan2d(p, r, tmin, tinc)
        raise KeyError(case)

    prev_type = None
    prev_dist = None
    prev_origin = None
    fracs = []
    for i in range(n_frames):
        feed(i)
        typ = np.asarray(mapper.state.vox_type)
        dist = np.asarray(mapper.state.dist_sq)
        origin = np.asarray(mapper.state.origin_blk) * 8
        if prev_type is None:
            prev_type, prev_dist, prev_origin = typ, dist, origin
            continue
        shift = origin - prev_origin
        # align previous state to the new canvas origin
        pt = np.full_like(prev_type, VOX_UNKNOWN)
        pd = np.full_like(prev_dist, 2 ** 30)
        sl_src = [slice(max(0, shift[a]), min(cs[a], cs[a] + shift[a]))
                  for a in range(3)]
        sl_dst = [slice(max(0, -shift[a]), min(cs[a], cs[a] - shift[a]))
                  for a in range(3)]
        pt[tuple(sl_dst)] = prev_type[tuple(sl_src)]
        pd[tuple(sl_dst)] = prev_dist[tuple(sl_src)]

        site_flip = (pt == VOX_OCCUPIED) != (typ == VOX_OCCUPIED)
        became_obs = (pt == VOX_UNKNOWN) != (typ == VOX_UNKNOWN)
        delta = site_flip.copy()
        # entering slabs on scroll frames
        boxes = []
        if site_flip.any():
            idx = np.argwhere(site_flip)
            boxes.append((idx.min(0), idx.max(0)))
        for a in range(3):
            if shift[a] > 0:
                lo = np.zeros(3, int); hi = cs - 1
                lo[a] = cs[a] - shift[a]
                boxes.append((lo, hi))
            elif shift[a] < 0:
                lo = np.zeros(3, int); hi = (cs - 1).copy()
                hi[a] = -shift[a] - 1
                boxes.append((lo, hi))

        observed = typ != VOX_UNKNOWN
        P = np.zeros(cs, bool)
        if boxes:
            ii = [np.arange(cs[a]) for a in range(3)]
            bd_min = np.full(cs, 2 ** 31 - 1, np.int64)
            for lo, hi in boxes:
                d = []
                for a in range(3):
                    da = np.maximum(0, np.maximum(lo[a] - ii[a],
                                                  ii[a] - hi[a]))
                    d.append(da.astype(np.int64) ** 2)
                bd = (d[0][:, None, None] + d[1][None, :, None]
                      + d[2][None, None, :])
                bd_min = np.minimum(bd_min, bd)
            P = observed & (bd_min <= pd.astype(np.int64))
        aff = P | site_flip | became_obs
        if not aff.any():
            fracs.append((0.0, 0.0, 0.0, 0.0))
            print(f"f{i:02d} shift={tuple(shift)} EMPTY slab")
        else:
            idx = np.argwhere(aff)
            lo, hi = idx.min(0), idx.max(0)
            ext = hi - lo + 1
            fr = ext / cs
            fracs.append((fr[0], fr[1], fr[2], float(np.prod(ext) / np.prod(cs))))
            # traffic model: p1 2.5 full + reshard 2*sy + ph2 4*sy + ph3
            # 5*sx*sy + final 4*sx*sy (z ungated) vs 17.5 full passes
            sx, sy = fr[0], fr[1]
            gated = 2.5 + 2 * sy + 4 * sy + 5 * sx * sy + 4 * sx * sy
            print(f"f{i:02d} shift={tuple(shift)} slab=({ext[0]},{ext[1]},"
                  f"{ext[2]}) frac=({fr[0]:.2f},{fr[1]:.2f},{fr[2]:.2f}) "
                  f"vol={fracs[-1][3]:.3f} est_traffic={gated / 17.5:.2f}x "
                  f"flips={int(site_flip.sum())} newobs={int(became_obs.sum())}")
        prev_type, prev_dist, prev_origin = typ, dist, origin

    if fracs:
        a = np.asarray(fracs)
        print(f"median frac x={np.median(a[:, 0]):.2f} "
              f"y={np.median(a[:, 1]):.2f} vol={np.median(a[:, 3]):.3f}")


if __name__ == "__main__":
    main()
