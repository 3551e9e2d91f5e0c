"""Interleaved A/B of engine variants on a REAL case pipeline.

Measures the full merge (sensor + fusion + EDT + merge) per frame for each
(env_variant, mid) combination on one benchmark case, interleaving passes so
the shared link's throttle drift cancels.  This is the decision harness for
the per-case default flips (docs/ROADMAP.md): the judge metric is the
depthcam-class merge time.

  python examples/bench_case_variants_ab.py depthcam
  python examples/bench_case_variants_ab.py cow_lady --rounds 6
"""
import argparse
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

VARIANTS = [
    ("fusepay", "fusepay"),   # round-1 default
    ("cf", "cf"),             # coarse-to-fine
]

N_WARMUP = 2
N_FRAMES = 20
CHUNK = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case", nargs="?", default="depthcam")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_suite import _link_latency, _make_frames
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import load_config

    print("backend:", jax.default_backend(), file=sys.stderr)
    link_ms = _link_latency() * 1e3

    runners = {}
    for name, variant in VARIANTS:
        overrides = dict(display_glb_edt=False, display_glb_ogm=False,
                         display_loc_edt=False, display_loc_ogm=False,
                         edt_env_variant=variant)
        if args.case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
            overrides.update(max_raycast_points=16384, fuse_raycast=True)
        cfg = load_config(args.case, **overrides)
        extent = min(cfg.local_size_m[0] * 0.45, 4.5)
        world = BoxWorld.corridor(seed=11, n_pillars=8, extent=extent,
                                  height=max(cfg.local_size_m[2], 2.5))
        poses = circular_trajectory(n_frames=N_WARMUP + N_FRAMES,
                                    radius=extent * 0.35,
                                    height=cfg.local_size_m[2] * 0.4)
        kind, data, kw = _make_frames(args.case, cfg, world, poses)
        mapper = VolumetricMapper(cfg)
        if kind == "pointcloud":
            pts, val = mapper.stage_pointcloud_batch(data)
            run = (lambda m=mapper, p=poses, a=pts, b=val:
                   m.process_pointcloud_batch(p[N_WARMUP:], a[N_WARMUP:],
                                              b[N_WARMUP:], chunk=CHUNK))
            for i in range(N_WARMUP):
                mapper.process_pointcloud(poses[i], pts[i], val[i])
        else:
            dev = jnp.asarray(data)
            bc = {"scan": mapper.process_scan2d_batch,
                  "depth": mapper.process_depth_batch,
                  "multiscan": mapper.process_multiscan_batch}[kind]
            pc = {"scan": mapper.process_scan2d,
                  "depth": mapper.process_depth,
                  "multiscan": mapper.process_multiscan}[kind]
            run = (lambda m=mapper, b=bc, p=poses, d=dev, k=dict(kw):
                   b(p[N_WARMUP:], d[N_WARMUP:], chunk=CHUNK, **k))
            for i in range(N_WARMUP):
                pc(poses[i], dev[i], *kw.values())
        out = run()
        _ = out.relax_iters  # compile + settle
        runners[name] = run

    best = {name: 1e9 for name, _ in VARIANTS}
    for r in range(args.rounds):
        for name, _ in VARIANTS:
            t0 = time.perf_counter()
            out = runners[name]()
            _ = int(np.asarray(out.device("relax_iters")))
            ms = (time.perf_counter() - t0 - link_ms * 1e-3) * 1e3 / N_FRAMES
            best[name] = min(best[name], ms)
    print(f"{args.case}: " + "   ".join(
        f"{n} {best[n]:.2f}ms" for n, _ in VARIANTS))


if __name__ == "__main__":
    main()
