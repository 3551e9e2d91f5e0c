"""Stage profile of the per-frame program on a REALISTIC map state, any case.

Builds the state by replaying the case's synthetic frames (same generator as
run_case.py), freezes it, then times (chained dispatches, one readback, link
RTT subtracted, within one process):

  merge (full)        the whole no-scroll frame program
  edt only            batch_edt over the live canvas occupancy
  raycast             projective pointcloud -> inst/counts (pointcloud cases)
  scroll step         canvas scroll by one block (amortised over ~1/4 frames)
  scroll (teleport)   full-canvas scroll path

merge - edt = fusion/masks/limited-observe/frontier/changed overhead.
Sensor data is pre-staged on device: a deployment's sensor DMA is local,
not this zero-egress relay (see bench.py) — run_case.py wall numbers include
that upload and are NOT engine time.

Usage: python examples/bench_frame_parts.py [--case cow_lady]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

K = 8
N_RAYS = 16384
N_WARM_FRAMES = 8

_LAT = [0.0]


def link_latency():
    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    return min(lat)


def timed_scan(step, init_carry):
    """step: carry -> carry. Chains K steps, one readback."""

    @jax.jit
    def chain(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=K)
        return jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.float32(y.reshape(-1)[0].astype(jnp.float32)),
            c, jnp.float32(0))

    np.asarray(chain(init_carry))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(init_carry))
        best = min(best, time.perf_counter() - t0)
    return (best - _LAT[0]) / K * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="cow_lady",
                    choices=["scan2D", "cow_lady", "ugv_corridor", "depthcam",
                             "laser3D", "uav_raycast_fine"])
    args = ap.parse_args()

    from run_case import synthetic_frames

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.models.pipeline import merge_frame_impl
    from gie_mapping_tpu.map_state import _do_scroll
    from gie_mapping_tpu.ops.edt_batch import batch_edt
    from gie_mapping_tpu.ops import raycast as rc
    from gie_mapping_tpu.runtime.datasets import BoxWorld
    from gie_mapping_tpu.utils.config import load_config
    from gie_mapping_tpu.utils.constants import VB_WIDTH

    cfg = load_config(args.case).replace(
        max_raycast_points=N_RAYS, display_glb_edt=False, display_glb_ogm=False)
    is_pointcloud = cfg.data_case in ("cow_lady", "ugv_corridor",
                                      "uav_raycast_fine")
    mapper = VolumetricMapper(cfg)
    last = None
    for proj, (kind, payload) in synthetic_frames(cfg, N_WARM_FRAMES):
        if kind == "pointcloud":
            out = mapper.process_pointcloud(proj, payload)
        elif kind == "scan":
            out = mapper.process_scan2d(proj, *payload)
        elif kind == "depth":
            out = mapper.process_depth(proj, *payload)
        elif kind == "multiscan":
            out = mapper.process_multiscan(proj, *payload)
        last = (proj, kind, payload)
    _ = out.relax_iters

    state = mapper.state
    proj = last[0]
    pvt, origin_blk, off = mapper._frame_geometry(np.asarray(proj.trans))
    fence, fence_on = mapper._fence_args(pvt)

    pvt_d = jnp.asarray(pvt)
    orig_d = jnp.asarray(origin_blk)
    off_d = jnp.asarray(off)

    if is_pointcloud:
        world = BoxWorld.corridor(seed=11, n_pillars=8,
                                  extent=max(cfg.local_size_m[:2]) * 0.7,
                                  height=max(1.5, cfg.local_size_m[2]))
        pts = world.pointcloud(proj, n_rays=N_RAYS, seed=99,
                               max_range=0.8 * cfg.local_size_m[0])
        pb, vb = mapper.stage_pointcloud(pts)
        world_pts = proj.l2g(pb)
        nt, np_ = rc.panorama_bins(cfg.local_size)
        inst, counts = rc.pointcloud_project(
            world_pts, vb, proj.trans, pvt_d,
            local_size=cfg.local_size, voxel_width=cfg.voxel_width,
            ogm_min_h=cfg.ogm_min_h, ogm_max_h=cfg.ogm_max_h,
            for_motion_planner=cfg.for_motion_planner,
            robot_r2_grids=cfg.robot_r2_grids, n_theta=nt, n_phi=np_)
    else:
        # projection sensors: fusion passes are dense and value-independent,
        # so a window crop of the live canvas types is a realistic inst_type
        s = tuple(slice(o, o + w) for o, w in zip(np.asarray(off),
                                                  cfg.local_size))
        inst = state.vox_type[s]
        counts = jnp.zeros(cfg.local_size, jnp.int32)

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()
    print(f"case {args.case}  link rtt: {_LAT[0]*1e3:.1f} ms", file=sys.stderr)

    def merge_step(st):
        st2, _ = merge_frame_impl(
            st, inst, counts, pvt_d, orig_d, off_d, *fence, cfg=cfg,
            input_pointcloud=is_pointcloud, do_scroll=False, use_fence=fence_on)
        return st2

    def edt_step(st):
        import dataclasses
        full = batch_edt(st.vox_type, max_width=sum(cfg.canvas_size))
        return dataclasses.replace(
            st, dist_sq=jnp.where(full["valid"], full["dist_sq"],
                                  st.dist_sq))

    def ray_step(carry):
        w, acc = carry
        i2, c2 = rc.pointcloud_project(
            w, vb, proj.trans, pvt_d,
            local_size=cfg.local_size, voxel_width=cfg.voxel_width,
            ogm_min_h=cfg.ogm_min_h, ogm_max_h=cfg.ogm_max_h,
            for_motion_planner=cfg.for_motion_planner,
            robot_r2_grids=cfg.robot_r2_grids, n_theta=nt, n_phi=np_)
        return (w + (c2[0, 0, 0] % 1).astype(w.dtype), acc + c2[0, 0, 0])

    # compact sizes: same ±1-x-block bound the mapper derives
    cb = np.asarray(cfg.canvas_blocks, np.int64)
    nb, ncols = int(cb.prod()), int(cb[0] * cb[1])
    bound = nb - int((cb - [1, 0, 0]).clip(0).prod())
    col_bound = ncols - int((cb[:2] - [1, 0]).clip(0).prod())
    cols = next((s for s in (32, 64) if col_bound <= s <= ncols), ncols)
    rows = next((s for s in (256, 1024) if bound <= s <= nb), None)

    def scroll_step_fn(st):
        # alternate +1/-1 block in x so state shape/occupancy stays realistic
        delta = jnp.where((st.origin_blk[0] % 2) == (orig_d[0] % 2), 1, -1)
        tgt = st.origin_blk.at[0].add(delta)
        return _do_scroll(st, tgt, cfg, compact_rows=rows, compact_cols=cols)

    def scroll_full_fn(st):
        delta = jnp.where((st.origin_blk[0] % 2) == (orig_d[0] % 2), 1, -1)
        tgt = st.origin_blk.at[0].add(delta)
        return _do_scroll(st, tgt, cfg)

    rows_tbl = [
        ("merge (full)", lambda: timed_scan(merge_step, state)),
        ("edt only", lambda: timed_scan(edt_step, state)),
    ]
    if is_pointcloud:
        rows_tbl.append(
            ("raycast", lambda: timed_scan(ray_step, (world_pts, jnp.int32(0)))))
    rows_tbl += [
        ("scroll step", lambda: timed_scan(scroll_step_fn, state)),
        ("scroll (teleport)", lambda: timed_scan(scroll_full_fn, state)),
    ]
    for name, fn in rows_tbl:
        print(f"{name}: {fn():.2f} ms")


if __name__ == "__main__":
    main()
