"""Per-case replay chunk-size A/B (round 4).

bench_chunk_ab.py pinned the per-PROGRAM throttle quantum on the cow-lady
headline (16 chained EDTs ~ 1 EDT in a throttled window).  depthcam rides
the 10 ms budget line, so its quantum share is the live lever: this
interleaves chunk sizes on ANY suite case using bench_suite's exact frame
machinery (same worlds, trajectories, staging).  Each arm replays
`chunk` frames as ONE scan program (closed-loop trajectory, ordinary
scrolls in-scan), so per-frame ms directly shows the quantum amortisation.

Usage: python examples/bench_case_chunk_ab.py --case depthcam --chunks 40,80
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
    ap.add_argument("--case", default="depthcam")
    ap.add_argument("--chunks", default="40,80")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _wait_for_backend
    from bench_suite import (N_WARMUP, _link_latency, _make_frames,
                             case_world_poses)

    _wait_for_backend()

    import jax.numpy as jnp

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.utils.config import load_config

    link_ms = _link_latency() * 1e3
    chunks = [int(c) for c in args.chunks.split(",")]

    overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                     display_loc_edt=False, display_loc_ogm=False)
    if args.case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        overrides.update(max_raycast_points=16384, fuse_raycast=True)
    cfg = load_config(args.case, **overrides)

    # one mapper + frame set per arm.  Trajectory step is DECOUPLED from
    # chunk (ADVICE r4, bench_suite.case_world_poses): every arm walks the
    # same 40-pose circle per loop; chunk only varies program length.
    arms = {}
    nf = {}
    for c in chunks:
        world, poses_m, n_frames = case_world_poses(cfg, c)
        nf[c] = n_frames
        poses = poses_m[:N_WARMUP] + poses_m
        kind, data, kw = _make_frames(args.case, cfg, world, poses)
        mapper = VolumetricMapper(cfg)
        if kind == "pointcloud":
            pts, val = mapper.stage_pointcloud_batch(data)
            run = (lambda m, p, x, v, c: lambda lo, hi:
                   m.process_pointcloud_batch(p[lo:hi], x[lo:hi], v[lo:hi],
                                              chunk=c))(mapper, poses, pts,
                                                        val, c)
            warm = (lambda m, p, x, v: lambda i:
                    m.process_pointcloud(p[i], x[i], v[i]))(mapper, poses,
                                                            pts, val)
        else:
            dev = jnp.asarray(data)
            batch_call = {"scan": mapper.process_scan2d_batch,
                          "depth": mapper.process_depth_batch,
                          "multiscan": mapper.process_multiscan_batch}[kind]
            per_call = {"scan": mapper.process_scan2d,
                        "depth": mapper.process_depth,
                        "multiscan": mapper.process_multiscan}[kind]
            run = (lambda bc, p, d, kww, c: lambda lo, hi:
                   bc(p[lo:hi], d[lo:hi], chunk=c, **kww))(batch_call, poses,
                                                           dev, kw, c)
            warm = (lambda pc, p, d, kww: lambda i:
                    pc(p[i], d[i], *kww.values()))(per_call, poses, dev, kw)
        for i in range(N_WARMUP):
            warm(i)
        out = run(N_WARMUP, N_WARMUP + nf[c])
        _ = int(np.asarray(out.device("relax_iters")))  # compile + sync
        arms[c] = run

    times = {c: [] for c in chunks}
    for _rep in range(args.reps):
        for c in chunks:
            t0 = time.perf_counter()
            out = arms[c](N_WARMUP, N_WARMUP + nf[c])
            _ = int(np.asarray(out.device("relax_iters")))
            times[c].append(
                ((time.perf_counter() - t0) * 1e3 - link_ms) / nf[c])

    print(json.dumps({
        "metric": f"{args.case}_chunk_ab_ms_per_frame",
        "best_ms": {str(c): round(min(v), 3) for c, v in times.items()},
        "passes": {str(c): [round(t, 2) for t in v]
                   for c, v in times.items()},
        "link_ms": round(link_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
