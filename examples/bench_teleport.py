"""Adversarial teleport-heavy trajectory bench (VERDICT r4 items 5/7).

The suite's circular trajectories only ever scroll by one block; workloads
that TELEPORT (relocalisation jumps, multi-site inspection, fence hops)
force the full-canvas scroll path + a full EDT recompute (gate level 3) on
the jump frame — the budget bench never visits that cliff.  This harness
replays two pose clusters separated by more than a canvas extent,
alternating every `period` frames, and reports ms/frame for
period in {10, 40} against the same-window no-teleport baseline, plus the
directly-chained teleport step cost.

Usage: python examples/bench_teleport.py [--case depthcam]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _wait_for_backend
    from bench_suite import _link_latency, _make_frames, case_world_poses

    _wait_for_backend()

    import jax.numpy as jnp

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.utils.config import load_config
    from gie_mapping_tpu.utils.geometry import Projection

    link_ms = _link_latency() * 1e3

    overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                     display_loc_edt=False, display_loc_ogm=False)
    if args.case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        overrides.update(max_raycast_points=16384, fuse_raycast=True)
    cfg = load_config(args.case, **overrides)

    world, base_poses, nb = case_world_poses(cfg, 40)
    jump = np.array([cfg.local_size_m[0] * 3.0, 0.0, 0.0], np.float32)

    def teleport_poses(period, n):
        out = []
        for i in range(n):
            p = base_poses[i % nb]
            if (i // period) % 2 == 1:
                p = Projection(rot=p.rot, trans=np.asarray(p.trans) + jump)
            out.append(p)
        return out

    arms = {"baseline": [base_poses[i % nb] for i in range(args.frames)]}
    for period in (40, 10):
        arms[f"teleport_every_{period}"] = teleport_poses(period, args.frames)

    N_WARMUP = 2
    results = {}
    per_arm = {}
    for name, poses_m in arms.items():
        poses = poses_m[:N_WARMUP] + poses_m
        kind, data, kw = _make_frames(args.case, cfg, world, poses)
        mapper = VolumetricMapper(cfg)
        if kind == "pointcloud":
            pts, val = mapper.stage_pointcloud_batch(data)
            run = lambda m=mapper, p=poses, x=pts, v=val: \
                m.process_pointcloud_batch(p[N_WARMUP:], x[N_WARMUP:],
                                           v[N_WARMUP:], chunk=40)
            warm = lambda i, m=mapper, p=poses, x=pts, v=val: \
                m.process_pointcloud(p[i], x[i], v[i])
        else:
            dev = jnp.asarray(data)
            bc = {"scan": mapper.process_scan2d_batch,
                  "depth": mapper.process_depth_batch,
                  "multiscan": mapper.process_multiscan_batch}[kind]
            pc = {"scan": mapper.process_scan2d,
                  "depth": mapper.process_depth,
                  "multiscan": mapper.process_multiscan}[kind]
            run = lambda b=bc, p=poses, d=dev, k=kw: \
                b(p[N_WARMUP:], d[N_WARMUP:], chunk=40, **k)
            warm = lambda i, f=pc, p=poses, d=dev, k=kw: \
                f(p[i], d[i], *k.values())
        for i in range(N_WARMUP):
            warm(i)
        out = run()
        _ = int(np.asarray(out.device("relax_iters")))  # compile + sync
        per_arm[name] = run

    # interleaved measurement: all arms within one window
    times = {n: [] for n in arms}
    for _rep in range(args.reps):
        for name, run in per_arm.items():
            t0 = time.perf_counter()
            out = run()
            _ = int(np.asarray(out.device("relax_iters")))
            times[name].append(
                ((time.perf_counter() - t0) * 1e3 - link_ms) / args.frames)

    print(json.dumps({
        "metric": f"{args.case}_teleport_ms_per_frame",
        "best_ms": {n: round(min(v), 3) for n, v in times.items()},
        "passes": {n: [round(t, 2) for t in v] for n, v in times.items()},
        "frames": args.frames,
        "jump_m": float(jump[0]),
        "link_ms": round(link_ms, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
