"""Canvas scroll-slack A/B (round 5).

cfg.canvas_slack_blocks=1 cuts depthcam's scroll count 3x (95 -> 32 per 8
suite loops, sim_scroll_policy-style host sim) at 1.12x canvas volume.
This interleaves slack 0 vs 1 on the suite's exact workload within one
window; per-case default decided by the measured net.

Usage: python examples/bench_gate_rung_ab.py [--case depthcam] [--reps 3]
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
    ap.add_argument("--chunk", type=int, default=80)
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

    MENUS = {
        "default": 0,
        "slack1": 1,
    }
    overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                     display_loc_edt=False, display_loc_ogm=False)
    if args.case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        overrides.update(max_raycast_points=16384, fuse_raycast=True)

    arms = {}
    lvls = {}
    for name, menu in MENUS.items():
        cfg = load_config(args.case, canvas_slack_blocks=menu, **overrides)
        world, poses_m, n_frames = case_world_poses(cfg, args.chunk)
        poses = poses_m[:N_WARMUP] + poses_m
        kind, data, kw = _make_frames(args.case, cfg, world, poses)
        mapper = VolumetricMapper(cfg)
        if kind == "pointcloud":
            pts, val = mapper.stage_pointcloud_batch(data)
            run = (lambda m, p, x, v, c, n: lambda:
                   m.process_pointcloud_batch(p[N_WARMUP:N_WARMUP + n],
                                              x[N_WARMUP:], v[N_WARMUP:],
                                              chunk=c))(
                mapper, poses, pts, val, args.chunk, n_frames)
            warm = (lambda m, p, x, v: lambda i:
                    m.process_pointcloud(p[i], x[i], v[i]))(
                mapper, poses, pts, val)
        else:
            dev = jnp.asarray(data)
            bc = {"scan": mapper.process_scan2d_batch,
                  "depth": mapper.process_depth_batch,
                  "multiscan": mapper.process_multiscan_batch}[kind]
            pc = {"scan": mapper.process_scan2d,
                  "depth": mapper.process_depth,
                  "multiscan": mapper.process_multiscan}[kind]
            run = (lambda b, p, d, k, c, n: lambda:
                   b(p[N_WARMUP:N_WARMUP + n], d[N_WARMUP:], chunk=c, **k))(
                bc, poses, dev, kw, args.chunk, n_frames)
            warm = (lambda f, p, d, k: lambda i:
                    f(p[i], d[i], *k.values()))(pc, poses, dev, kw)
        for i in range(N_WARMUP):
            warm(i)
        out = run()
        lvls[name] = int(np.asarray(out.device("gate_level")))
        arms[name] = (run, n_frames)

    times = {n: [] for n in arms}
    for _rep in range(args.reps):
        for n, (run, n_frames) in arms.items():
            t0 = time.perf_counter()
            out = run()
            _ = int(np.asarray(out.device("relax_iters")))
            times[n].append(
                ((time.perf_counter() - t0) * 1e3 - link_ms) / n_frames)

    best = {n: round(min(v), 3) for n, v in times.items()}
    print(json.dumps({
        "metric": f"{args.case}_slack_ab_ms_per_frame",
        "best_ms": best,
        "speedup_slack1": round(best["default"] / max(best["slack1"], 1e-9),
                                 3),
        "passes": {n: [round(t, 2) for t in v] for n, v in times.items()},
        "gate_level_last": lvls,
        "link_ms": round(link_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
