"""Padded-capacity sensitivity of the point-cloud path (VERDICT r2 item 7).

Real cow-lady clouds are ~100-300 k points; the bench proxy stages 16 k rays
into a cfg.max_raycast_points-sized static buffer.  The reference pays per
actual point (pntcld_map_maker.cpp:49-61); here the projective panorama
build reduces over the PADDED capacity, so this measures whether frame time
scales with capacity or with live points: the SAME ~12 k-point clouds are
replayed through mappers whose static capacity is 16 k / 64 k / 128 k,
interleaved A/B/C per pass (same throttle window).

If capacity-bound, the fix is masked compaction of the padded tail; if
live-point-bound, the 16 k proxy underestimates nothing but ray count.

Usage: python examples/bench_raycast_capacity_ab.py [--frames 20] [--reps 3]
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

N_WARMUP = 2
CHUNK = 20
N_LIVE = 12288  # live points per frame (fixed across capacities)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--caps", default="16384,65536,131072")
    args = ap.parse_args()

    from bench import _wait_for_backend

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

    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses_m = circular_trajectory(n_frames=args.frames, radius=1.5,
                                  height=1.2, closed=True)
    poses = poses_m[:N_WARMUP] + poses_m  # closed: one scan program/pass
    clouds = [world.pointcloud(p, n_rays=N_LIVE, max_range=8.0, seed=i)
              for i, p in enumerate(poses)]

    caps = [int(c) for c in args.caps.split(",")]
    variants = {}
    for cap in caps:
        cfg = cow_lady_config(max_raycast_points=cap, fuse_raycast=True,
                              display_glb_edt=False, display_glb_ogm=False)
        m = VolumetricMapper(cfg)
        # pad_to=cap: defeat the live-point bucketing (round 4) so the arm
        # really stages the full capacity this A/B is measuring
        pts, val = m.stage_pointcloud_batch(clouds, pad_to=cap)
        run = lambda m=m, pts=pts, val=val: m.process_pointcloud_batch(
            poses[N_WARMUP:], pts[N_WARMUP:], val[N_WARMUP:], chunk=CHUNK)
        for i in range(N_WARMUP):
            m.process_pointcloud(poses[i], pts[i], val[i])
        out = run()
        _ = out.relax_iters  # compile
        variants[cap] = run

    times = {cap: [] for cap in caps}
    for rep in range(args.reps):
        for cap in caps:
            t0 = time.perf_counter()
            out = variants[cap]()
            _ = int(np.asarray(out.device("relax_iters")))
            times[cap].append(
                ((time.perf_counter() - t0) * 1e3 - link_ms) / args.frames)
    best = {cap: min(ts) for cap, ts in times.items()}
    base = best[caps[0]]
    print(json.dumps({
        "metric": "cowlady_raycast_capacity_ab_ms_per_frame",
        "live_points": N_LIVE,
        "best_ms": {str(c): round(v, 3) for c, v in best.items()},
        "vs_16k": {str(c): round(v / max(base, 1e-9), 3)
                   for c, v in best.items()},
        "passes": {str(c): [round(t, 2) for t in ts]
                   for c, ts in times.items()},
        "link_ms": round(link_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
