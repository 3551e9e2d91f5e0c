"""Interleaved A/B: canvas-EDT engine vs the reference-mirroring relax
engine on a realistic cow-lady state (VERDICT r3 item 8: the relax engine is
semantics-tested but had no perf story — bench it once, then label it).

Both arms run the SAME frozen state + observation through merge_frame_impl
(do_scroll=False), chained K dispatches + one readback, interleaved rounds
A,B,A,B so throttle drift cancels.  Expectation: relax loses badly (its
fixed point re-sweeps the canvas per iteration); that is fine — it is the
semantics oracle for test_engine_consistency/test_wave, not a deployment
path.

Usage: python examples/bench_relax_ab.py [--rounds 3]
"""
import argparse
import functools
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
import jax
import jax.numpy as jnp

K = 8
N_RAYS = 16384
_LAT = [0.0]


def link_latency():
    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    return min(lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.models.pipeline import merge_frame_impl
    from gie_mapping_tpu.ops import raycast as rc
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    cfg = cow_lady_config(max_raycast_points=N_RAYS,
                          display_glb_edt=False, display_glb_ogm=False)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses = circular_trajectory(n_frames=8, radius=1.5, height=1.2)
    mapper = VolumetricMapper(cfg)
    for i, p in enumerate(poses):
        pts = world.pointcloud(p, n_rays=N_RAYS, max_range=8.0, seed=i)
        out = mapper.process_pointcloud(p, *mapper.stage_pointcloud(pts))
    _ = out.relax_iters

    state = mapper.state
    proj = poses[-1]
    pvt, origin_blk, off = mapper._frame_geometry(np.asarray(proj.trans))
    fence, fence_on = mapper._fence_args(pvt)
    pts = world.pointcloud(proj, n_rays=N_RAYS, max_range=8.0, seed=99)
    pb, vb = mapper.stage_pointcloud(pts)
    world_pts = proj.l2g(pb)
    nt, np_ = rc.panorama_bins(cfg.local_size)
    inst, counts = rc.pointcloud_project(
        world_pts, vb, proj.trans, jnp.asarray(pvt),
        local_size=cfg.local_size, voxel_width=cfg.voxel_width,
        ogm_min_h=cfg.ogm_min_h, ogm_max_h=cfg.ogm_max_h,
        for_motion_planner=cfg.for_motion_planner,
        robot_r2_grids=cfg.robot_r2_grids, n_theta=nt, n_phi=np_)

    geom = (jnp.asarray(pvt), jnp.asarray(origin_blk), jnp.asarray(off))

    def mk_chain(mcfg):
        step = functools.partial(merge_frame_impl, cfg=mcfg,
                                 input_pointcloud=True, do_scroll=False,
                                 use_fence=fence_on)

        @jax.jit
        def chain(st):
            def body(c, _):
                s, out = step(c, inst, counts, *geom, *fence)
                return s, out["relax_iters"]
            s, iters = jax.lax.scan(body, st, None, length=K)
            return s.dist_sq[0, 0, 0].astype(jnp.float32) + jnp.sum(iters), \
                jnp.max(iters)
        return chain

    arms = {
        "canvas_edt": mk_chain(cfg),
        "relax": mk_chain(cfg.replace(merge_mode="relax")),
    }

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()
    print(f"link rtt: {_LAT[0]*1e3:.1f} ms", file=sys.stderr)

    # warm both arms (compile)
    iters = {}
    for name, chain in arms.items():
        _, mi = chain(state)
        iters[name] = int(np.asarray(mi))

    best = {name: 1e9 for name in arms}
    for _ in range(args.rounds):
        for name, chain in arms.items():
            t0 = time.perf_counter()
            v, _ = chain(state)
            np.asarray(v)
            best[name] = min(best[name],
                             (time.perf_counter() - t0 - _LAT[0]) / K * 1e3)
    row = {
        "metric": "cowlady_engine_ab_ms_per_frame",
        "best_ms": {k: round(v, 3) for k, v in best.items()},
        "relax_vs_canvas": round(best["relax"] / best["canvas_edt"], 3),
        "relax_iters": iters,
        "link_ms": round(_LAT[0] * 1e3, 2),
    }
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
