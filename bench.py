"""Headline benchmark: cow-lady-class workload (0.1 m voxels, 100x100x30
scrolling window, fast_mode off, 2 m cutoff) on one chip.

Prints ONE JSON line: median per-frame OGM+EDT update time vs the 10 ms
north-star budget (BASELINE.md: "<=10 ms median OGM+EDT @0.1 m cow-lady";
vs_baseline > 1 means faster than the target)."""
from __future__ import annotations

import json
import time

import numpy as np

N_WARMUP = 3
N_FRAMES = 20
N_RAYS = 16384
TARGET_MS = 10.0


def main():
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    cfg = cow_lady_config(max_raycast_points=N_RAYS)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses = circular_trajectory(n_frames=N_WARMUP + N_FRAMES, radius=1.5, height=1.2)

    # pre-simulate all sensor frames (dataset prep, not engine time)
    frames = [
        world.pointcloud(p, n_rays=N_RAYS, max_range=8.0, seed=i)
        for i, p in enumerate(poses)
    ]

    mapper = VolumetricMapper(cfg)
    times = []
    for i, (proj, pts) in enumerate(zip(poses, frames)):
        out = mapper.process_pointcloud(proj, pts)
        if i >= N_WARMUP:
            times.append(out.ogm_time_ms + out.edt_time_ms)

    med = float(np.median(times))
    vox_rate = cfg.map_volume * 1e3 / med / 1e6  # Mvoxels/s of window update
    print(json.dumps({
        "metric": "cowlady_ogm_edt_ms_median",
        "value": round(med, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / med, 3),
        "extra": {
            "frames": len(times),
            "p90_ms": round(float(np.percentile(times, 90)), 3),
            "mvoxels_per_s": round(vox_rate, 2),
            "relax_iters_last": mapper.last_output.relax_iters,
        },
    }))


if __name__ == "__main__":
    main()
