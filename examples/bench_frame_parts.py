"""Stage profile of the per-frame program on a REALISTIC map state.

Runs the bench scenario for a few frames, freezes the state, then times
(chained dispatches, one readback, link RTT subtracted, within one process):

  merge (full)        the whole no-scroll frame program
  edt only            batch_edt over the live canvas occupancy
  raycast             projective pointcloud -> inst/counts
  scroll step         canvas scroll by one block (amortised ~1/4 frames)

merge - edt = fusion/masks/limited-observe/frontier/changed overhead.
"""
import os
import sys
import time

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
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.models.pipeline import merge_frame_impl
    from gie_mapping_tpu.map_state import _do_scroll
    from gie_mapping_tpu.ops.edt_batch import batch_edt
    from gie_mapping_tpu.ops import raycast as rc
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    cfg = cow_lady_config(max_raycast_points=N_RAYS,
                          display_glb_edt=False, display_glb_ogm=False)
    world = BoxWorld.corridor(seed=11, n_pillars=8, extent=4.0, height=2.5)
    poses = circular_trajectory(n_frames=N_WARM_FRAMES, radius=1.5, height=1.2)
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

    pvt_d = jnp.asarray(pvt)
    orig_d = jnp.asarray(origin_blk)
    off_d = jnp.asarray(off)

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()
    print(f"link rtt: {_LAT[0]*1e3:.1f} ms", file=sys.stderr)

    def merge_step(st):
        st2, _ = merge_frame_impl(
            st, inst, counts, pvt_d, orig_d, off_d, *fence, cfg=cfg,
            input_pointcloud=True, do_scroll=False, use_fence=fence_on)
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

    def scroll_step_fn(st):
        # alternate +1/-1 block in x so state shape/occupancy stays realistic;
        # compact sizes match mapper._scroll_compact_rows for a +-1 x shift
        delta = jnp.where((st.origin_blk[0] % 2) == (orig_d[0] % 2), 1, -1)
        tgt = st.origin_blk.at[0].add(delta)
        return _do_scroll(st, tgt, cfg, compact_rows=256, compact_cols=64)

    def scroll_full_fn(st):
        delta = jnp.where((st.origin_blk[0] % 2) == (orig_d[0] % 2), 1, -1)
        tgt = st.origin_blk.at[0].add(delta)
        return _do_scroll(st, tgt, cfg)

    rows = [
        ("merge (full)", lambda: timed_scan(merge_step, state)),
        ("edt only", lambda: timed_scan(edt_step, state)),
        ("raycast", lambda: timed_scan(ray_step, (world_pts, jnp.int32(0)))),
        ("scroll step", lambda: timed_scan(scroll_step_fn, state)),
        ("scroll (teleport)", lambda: timed_scan(scroll_full_fn, state)),
    ]
    for name, fn in rows:
        print(f"{name}: {fn():.2f} ms")


if __name__ == "__main__":
    main()
