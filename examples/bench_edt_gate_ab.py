"""Interleaved on-device A/B: change-gated canvas EDT vs full recompute.

Per case, two mappers (cfg.edt_gate off/on) replay the SAME staged frame
sequence; passes alternate A/B/A/B so both variants sample the same tunnel
throttle (CLAUDE.md: compare variants only within one run).  Each pass is
chained scan-chunk dispatches with one readback (bench.py methodology).

Prints one JSON line per case with per-variant best ms/frame, the ratio,
and the gate levels the gated run actually took (observability: gate_level
== len(menu) means full recompute, lower = smaller slab).

Usage: python examples/bench_edt_gate_ab.py [--cases cow_lady,depthcam]
       [--frames 20] [--reps 3] [--variants gate|pmode]

--variants pmode A/Bs the gate's P-test granularity instead
(cfg.edt_gate_pmode "voxel" vs "block", gate ON in both arms).
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


def build_case(case, n_frames, **cfg_overrides):
    import jax.numpy as jnp

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import load_config

    overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                     display_loc_edt=False, display_loc_ogm=False,
                     **cfg_overrides)
    if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        overrides.update(max_raycast_points=16384, fuse_raycast=True)
    cfg = load_config(case, **overrides)

    extent = min(cfg.local_size_m[0] * 0.45, 4.5)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=extent,
                              height=max(cfg.local_size_m[2], 2.5))
    poses_m = circular_trajectory(n_frames=n_frames, radius=extent * 0.35,
                                  height=cfg.local_size_m[2] * 0.4,
                                  closed=True)
    poses = poses_m[:N_WARMUP] + poses_m  # closed: one scan program/pass
    mapper = VolumetricMapper(cfg)
    if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
        clouds = [world.pointcloud(p, n_rays=16384, max_range=8.0, seed=i)
                  for i, p in enumerate(poses)]
        pts, val = mapper.stage_pointcloud_batch(clouds)
        run = lambda lo, hi: mapper.process_pointcloud_batch(
            poses[lo:hi], pts[lo:hi], val[lo:hi], chunk=CHUNK)
        warm = lambda i: mapper.process_pointcloud(poses[i], pts[i], val[i])
    elif case == "depthcam":
        imgs = [world.depth_image(p, rows=96, cols=128, fx=80.0, fy=80.0,
                                  max_range=6.0) for p in poses]
        d0 = imgs[0]
        dev = jnp.asarray(np.stack([im[0] for im in imgs]))
        kw = dict(fx=d0[1], fy=d0[2], cx=d0[3], cy=d0[4])
        run = lambda lo, hi: mapper.process_depth_batch(
            poses[lo:hi], dev[lo:hi], chunk=CHUNK, **kw)
        warm = lambda i: mapper.process_depth(poses[i], dev[i], *kw.values())
    else:
        raise KeyError(case)
    return mapper, run, warm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="cow_lady,depthcam")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="gate",
                    choices=("gate", "pmode", "p1c", "combo", "stack"))
    args = ap.parse_args()

    from bench import _wait_for_backend

    _wait_for_backend()

    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = int(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    link_ms = float(np.median(lat)) * 1e3

    if args.variants == "gate":
        arms = {False: dict(edt_gate=False), True: dict(edt_gate=True)}
    elif args.variants == "pmode":  # A = voxel P-pass, B = block-granular
        arms = {False: dict(edt_gate=True, edt_gate_pmode="voxel"),
                True: dict(edt_gate=True, edt_gate_pmode="block")}
    elif args.variants == "p1c":    # A/B the phase-1 cache in isolation
        arms = {False: dict(edt_gate=True, edt_p1_cache=False),
                True: dict(edt_gate=True, edt_p1_cache=True)}
    elif args.variants == "combo":  # round-3 default vs the p1c candidate
        # (pmode "block" measured as a dead end: its cell-test slack pushed
        # the steady-state cow bbox past the largest menu slab -> full
        # recompute every frame; docs/ROADMAP.md "measured dead ends")
        arms = {False: dict(edt_gate=True),
                True: dict(edt_gate=True, edt_p1_cache=True)}
    else:                           # "stack": default vs the FULL traffic-cut
        # stack (p1 cache + block-granular P test together) — individually
        # each was throttle-neutral; combined they drop the full-canvas
        # phase-1 scan+reshard AND the P-pass dist read (~150 MB/frame on
        # depthcam), which may register even in a 3x window
        arms = {False: dict(edt_gate=True),
                True: dict(edt_gate=True, edt_p1_cache=True,
                           edt_gate_pmode="block")}
    for case in args.cases.split(","):
        variants = {}
        for gate, ovr in arms.items():
            mapper, run, warm = build_case(case, args.frames, **ovr)
            for i in range(N_WARMUP):
                warm(i)
            out = run(N_WARMUP, N_WARMUP + args.frames)
            _ = out.relax_iters  # compile + converge state
            variants[gate] = (mapper, run)

        times = {False: [], True: []}
        levels = {False: [], True: []}
        for rep in range(args.reps):
            for gate in (False, True):
                mapper, run = variants[gate]
                t0 = time.perf_counter()
                out = run(N_WARMUP, N_WARMUP + args.frames)
                _ = int(np.asarray(out.device("relax_iters")))
                times[gate].append(
                    ((time.perf_counter() - t0) * 1e3 - link_ms)
                    / args.frames)
                levels[gate].append(int(np.asarray(out.device("gate_level"))))
        best_off = min(times[False])
        best_on = min(times[True])
        print(json.dumps({
            "metric": f"{case}_edt_{args.variants}_ab_ms_per_frame",
            "arms": {"off": str(arms[False]), "on": str(arms[True])},
            "off": round(best_off, 3),
            "on": round(best_on, 3),
            "speedup": round(best_off / max(best_on, 1e-9), 3),
            "passes_off": [round(t, 2) for t in times[False]],
            "passes_on": [round(t, 2) for t in times[True]],
            "gate_level_last": levels[True],
            "gate_level_last_off_arm": levels[False],
            "link_ms": round(link_ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
