"""Online per-frame dispatch vs scanned replay A/B (VERDICT r4 item 5).

The reference's only mode is the live node: one frame arrives, one frame is
processed (volumetric_mapper.cpp:138-224).  This build's bench numbers come
from the scanned-replay path; the online path (process_pointcloud — one jit
dispatch per frame) was last characterised in round 1.  This harness times
BOTH on the same cow-lady workload in one window:

  online     N per-frame process_pointcloud calls, one readback at the end
             (dispatches overlap on-device; the readback drains the queue) —
             per-frame engine time + per-dispatch enqueue cost
  online+sync  same but a readback EVERY frame — what a 2 Hz consumer that
             reads each frame's outputs over THIS remote link would see
             (adds the full link RTT per frame; a local deployment pays µs)
  replay     process_pointcloud_batch, chunk=40 (the bench path)

Usage: python examples/bench_online_ab.py [--frames 40] [--reps 3]
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
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rays", type=int, default=16384)
    args = ap.parse_args()

    from bench import _wait_for_backend
    from bench_suite import _link_latency

    _wait_for_backend()

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    link_ms = _link_latency() * 1e3
    N_WARMUP = 3
    cfg = cow_lady_config(max_raycast_points=args.rays, fuse_raycast=True,
                          display_glb_edt=False, display_glb_ogm=False)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses_m = circular_trajectory(n_frames=args.frames, radius=1.5,
                                  height=1.2, closed=True)
    poses = poses_m[:N_WARMUP] + poses_m
    frames = [world.pointcloud(p, n_rays=args.rays, max_range=8.0, seed=i)
              for i, p in enumerate(poses)]

    def fresh():
        m = VolumetricMapper(cfg)
        pts, val = m.stage_pointcloud_batch(frames)
        for i in range(N_WARMUP):
            m.process_pointcloud(poses[i], pts[i], val[i])
        out = m.process_pointcloud_batch(poses[N_WARMUP:], pts[N_WARMUP:],
                                         val[N_WARMUP:], chunk=40)
        _ = int(np.asarray(out.device("relax_iters")))
        return m, pts, val

    m, pts, val = fresh()
    K = args.frames

    def run_online(sync_each):
        t0 = time.perf_counter()
        for i in range(N_WARMUP, N_WARMUP + K):
            out = m.process_pointcloud(poses[i], pts[i], val[i])
            if sync_each:
                _ = int(np.asarray(out.device("relax_iters")))
        if not sync_each:
            _ = int(np.asarray(out.device("relax_iters")))
        n_sync = K if sync_each else 1
        return ((time.perf_counter() - t0) * 1e3 - link_ms * n_sync) / K

    def run_replay():
        t0 = time.perf_counter()
        out = m.process_pointcloud_batch(poses[N_WARMUP:], pts[N_WARMUP:],
                                         val[N_WARMUP:], chunk=40)
        _ = int(np.asarray(out.device("relax_iters")))
        return ((time.perf_counter() - t0) * 1e3 - link_ms) / K

    arms = {"online": lambda: run_online(False),
            "online_sync_each": lambda: run_online(True),
            "replay_chunk40": run_replay}
    # warm the per-frame jit paths once (scroll + no-scroll programs)
    run_online(False)

    times = {n: [] for n in arms}
    for _rep in range(args.reps):
        for n, f in arms.items():
            times[n].append(f())

    print(json.dumps({
        "metric": "cowlady_online_vs_replay_ms_per_frame",
        "best_ms": {n: round(min(v), 3) for n, v in times.items()},
        "passes": {n: [round(t, 2) for t in v] for n, v in times.items()},
        "frames": K,
        "rays": args.rays,
        "link_ms": round(link_ms, 2),
        "note": "online_sync_each includes one remote-link RTT per frame; "
                "a local deployment's per-frame sync is microseconds",
    }), flush=True)


if __name__ == "__main__":
    main()
