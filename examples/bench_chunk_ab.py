"""Replay chunk-size A/B on the headline workload (round 3).

bench_throttle_quantum.py showed the throttle charges mostly PER PROGRAM
(16 chained EDTs ~ 1 EDT), so the scanned-replay chunk size should divide
the throttled-window ms/frame.  This interleaves chunk sizes over the
exact bench.py workload (cow-lady, 16 k rays, 20 frames) in one window.

Usage: python examples/bench_chunk_ab.py [--chunks 10,20] [--frames 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cc():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_cc()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="10,20")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import N_RAYS, N_WARMUP, _wait_for_backend

    _wait_for_backend()

    import jax
    import jax.numpy as jnp

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = int(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    link_ms = float(np.median(lat)) * 1e3

    cfg = cow_lady_config(max_raycast_points=N_RAYS, fuse_raycast=True,
                          display_glb_edt=False, display_glb_ogm=False)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses = circular_trajectory(n_frames=N_WARMUP + args.frames, radius=1.5,
                                height=1.2)
    clouds = [world.pointcloud(p, n_rays=N_RAYS, max_range=8.0, seed=i)
              for i, p in enumerate(poses)]

    chunks = [int(c) for c in args.chunks.split(",")]
    mappers = {}
    for c in chunks:
        m = VolumetricMapper(cfg)
        pts, val = m.stage_pointcloud_batch(clouds)
        for i in range(N_WARMUP):
            m.process_pointcloud(poses[i], pts[i], val[i])
        out = m.process_pointcloud_batch(poses[N_WARMUP:], pts[N_WARMUP:],
                                         val[N_WARMUP:], chunk=c)
        _ = out.relax_iters  # compile
        mappers[c] = (m, pts, val)

    times = {c: [] for c in chunks}
    for rep in range(args.reps):
        for c in chunks:
            m, pts, val = mappers[c]
            t0 = time.perf_counter()
            out = m.process_pointcloud_batch(poses[N_WARMUP:],
                                             pts[N_WARMUP:], val[N_WARMUP:],
                                             chunk=c)
            _ = int(np.asarray(out.device("relax_iters")))
            times[c].append(((time.perf_counter() - t0) * 1e3 - link_ms)
                            / args.frames)
    print(json.dumps({
        "metric": "cowlady_chunk_ab_ms_per_frame",
        "best_ms": {str(c): round(min(v), 3) for c, v in times.items()},
        "passes": {str(c): [round(t, 2) for t in v]
                   for c, v in times.items()},
        "scanned_frames": {str(c): mappers[c][0].replay_scanned_frames
                           for c in chunks},
        "link_ms": round(link_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
