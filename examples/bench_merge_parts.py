"""Bisect the non-EDT cost of the merge program on a realistic state.

Times each merge sub-piece standalone (chained dispatches, one readback, link
RTT subtracted; same-run comparison only — the shared TPU throttles):

  noop copy         dispatch + one trivial state touch (floor)
  fusion window     occupancy low-pass + type re-threshold + uncrop
  alloc masks       observed -> needed blocks -> present repeat
  limited observe   keep-old-coc pass (reads dist+coc, writes both)
  frontier          6-neighbour unknown dilation + FNT mark
  changed blk       changed-voxel reduce to block flags
  edt only          batch_edt over the canvas
  merge (full)      the whole no-scroll frame program
"""
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

import dataclasses

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


def timed_scan(step, init_carry):
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
    from gie_mapping_tpu.models.pipeline import merge_frame_impl, _crop, _uncrop
    from gie_mapping_tpu.ops.edt_batch import batch_edt
    from gie_mapping_tpu.ops import raycast as rc
    from gie_mapping_tpu.ops.fusion import _lowpass
    from gie_mapping_tpu.ops.wave import COC_INVALID16, mark_frontiers
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils import constants as _c
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

    pvt_d = jnp.asarray(pvt)
    orig_d = jnp.asarray(origin_blk)
    off_d = jnp.asarray(off)
    local_size = cfg.local_size
    canvas_size = cfg.canvas_size
    bx, by, bz = cfg.canvas_blocks
    W = _c.VB_WIDTH
    canvas_origin_vox = orig_d * W

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()
    print(f"link rtt: {_LAT[0]*1e3:.1f} ms", file=sys.stderr)

    win = lambda a: _crop(a, off_d, local_size)

    def noop_step(st):
        return dataclasses.replace(st, dist_sq=st.dist_sq + 1)

    def fusion_step(st):
        hit = counts > 0
        miss = (counts < 0) & ~hit
        pbty = jnp.minimum(1.0, (-counts).astype(jnp.float32) / 10.0)
        oo, ot = win(st.occ_val), win(st.vox_type)
        occ_h, type_h = _lowpass(oo, ot, _c.OCC_HIT_VAL, 1.0, cfg.occupancy_threshold)
        occ_m, type_m = _lowpass(oo, ot, _c.OCC_FREE_VAL, pbty, cfg.occupancy_threshold)
        upd = hit | miss
        no = jnp.where(upd, jnp.where(hit, occ_h, occ_m), oo)
        ntp = jnp.where(upd, jnp.where(hit, type_h, type_m), ot)
        return dataclasses.replace(
            st, occ_val=_uncrop(st.occ_val, no, off_d),
            vox_type=_uncrop(st.vox_type, ntp, off_d))

    def alloc_step(st):
        observed = counts != 0
        canvas_observed = _uncrop(jnp.zeros(canvas_size, jnp.bool_), observed, off_d)
        needed = canvas_observed.reshape(bx, W, by, W, bz, W).any((1, 3, 5))
        present = st.present | needed
        pv = jnp.repeat(jnp.repeat(jnp.repeat(present, W, 0), W, 1), W, 2)
        return dataclasses.replace(
            st, present=present,
            vox_type=jnp.where(pv, st.vox_type, st.vox_type))

    def limobs_step(st):
        old_coc_rel = st.coc.astype(jnp.int32) - canvas_origin_vox
        old_valid = st.coc[..., 0] != COC_INVALID16
        cs_arr = jnp.asarray(canvas_size, jnp.int32)
        old_in = jnp.all((old_coc_rel >= 0) & (old_coc_rel < cs_arr), -1)
        keep_old = old_valid & ~old_in & (st.dist_sq < st.dist_sq + 1)
        dist = jnp.where(keep_old, st.dist_sq, st.dist_sq + 1)
        coc = jnp.where(keep_old[..., None], st.coc, st.coc + 1)
        return dataclasses.replace(st, dist_sq=dist, coc=coc)

    def frontier_step(st):
        glb_type = win(st.vox_type)
        gt2, fnt = mark_frontiers(st.vox_type, glb_type, off_d, local_size)
        return dataclasses.replace(
            st, vox_type=_uncrop(st.vox_type, gt2, off_d))

    def changed_step(st):
        changed = (st.dist_sq != st.dist_sq + 1) | (st.vox_type != st.vox_type + 1)
        cb = changed.reshape(bx, W, by, W, bz, W).any((1, 3, 5)) & st.present
        return dataclasses.replace(st, present=cb)

    def edt_step(st):
        full = batch_edt(st.vox_type, max_width=sum(canvas_size))
        return dataclasses.replace(
            st, dist_sq=jnp.where(full["valid"], full["dist_sq"], st.dist_sq))

    def merge_step(st):
        st2, _ = merge_frame_impl(
            st, inst, counts, pvt_d, orig_d, off_d, *fence, cfg=cfg,
            input_pointcloud=True, do_scroll=False, use_fence=fence_on)
        return st2

    rows = [
        ("noop copy", noop_step),
        ("fusion window", fusion_step),
        ("alloc masks", alloc_step),
        ("limited observe", limobs_step),
        ("frontier", frontier_step),
        ("changed blk", changed_step),
        ("edt only", edt_step),
        ("merge (full)", merge_step),
    ]
    for name, fn in rows:
        print(f"{name}: {timed_scan(fn, state):.2f} ms")


if __name__ == "__main__":
    main()
