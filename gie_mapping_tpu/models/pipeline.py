"""The jitted per-frame map-update pipeline.

TPU-native equivalent of the reference's publishMap hot path
(/root/reference/src/volumetric_mapper.cpp:138-224): one XLA program per frame
covering block allocation, occupancy fusion, batch local EDT, reconciliation,
raise/lower fixed-point relaxation, frontier extraction and changed-block
tracking — where the reference issues dozens of kernel launches with per-level
host readbacks (wave_helper.h:23,82), this dispatches once and converges
on-device.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..map_state import (
    GlobalMap,
    allocate_blocks,
    build_directory,
    gather_canvas,
    scatter_canvas,
)
from ..ops.edt_batch import batch_edt
from ..ops.wave import (
    invalidate_disappeared,
    mark_frontiers,
    reconcile_window,
    relax_fixed_point,
)
from ..utils import geometry as geo
from ..utils.config import MapConfig
from ..utils.constants import (
    EMPTY_VALUE,
    INVALID_COC,
    VB_WIDTH,
    VOX_FNT,
    VOX_FREE,
    VOX_UNKNOWN,
)

from ..utils import constants as _c


def _crop(arr, off, shape):
    """dynamic_slice window crop of a canvas array (trailing dims kept)."""
    extra = arr.shape[3:]
    starts = (off[0], off[1], off[2]) + (0,) * len(extra)
    return jax.lax.dynamic_slice(arr, starts, tuple(shape) + extra)


def _uncrop(arr, patch, off):
    extra = arr.shape[3:]
    starts = (off[0], off[1], off[2]) + (0,) * len(extra)
    return jax.lax.dynamic_update_slice(arr, patch, starts)


def merge_frame_impl(
    gmap: GlobalMap,
    inst_type,          # int8 [X,Y,Z] from a projection sensor (or raycaster)
    ray_count,          # int32 [X,Y,Z] (zeros for projection sensors)
    pvt,                # int32 [3] window pivot (glb voxel coord of window corner)
    canvas_origin_blk,  # int32 [3]
    win_off,            # int32 [3] window offset inside the canvas (voxels)
    fence_ll, fence_ur, fence_active, fence_n,
    *,
    cfg: MapConfig,
    input_pointcloud: bool,
    mesh=None,          # jax.sharding.Mesh: shard canvas-x / pool-blocks
):
    """Fuse one local observation into the global map and refresh the EDT.

    Returns (gmap', outputs dict).
    """
    local_size = cfg.local_size
    X, Y, Z = local_size
    canvas_blocks = cfg.canvas_blocks
    canvas_size = cfg.canvas_size
    canvas_origin_vox = canvas_origin_blk * VB_WIDTH

    observed = (ray_count != 0) if input_pointcloud else (inst_type != VOX_UNKNOWN)

    # ---- block allocation (glb_hash_map.cu:58-113) ----------------------
    canvas_observed = jnp.zeros(canvas_size, jnp.bool_)
    canvas_observed = _uncrop(canvas_observed, observed, win_off)
    bx, by, bz = canvas_blocks
    needed_blk = canvas_observed.reshape(bx, VB_WIDTH, by, VB_WIDTH, bz, VB_WIDTH).any((1, 3, 5))

    directory = build_directory(gmap, canvas_origin_blk, canvas_blocks)
    gmap, directory = allocate_blocks(gmap, directory, needed_blk, canvas_origin_blk)

    # ---- canvas materialisation ----------------------------------------
    canvas = gather_canvas(gmap, directory, canvas_blocks)
    if mesh is not None:
        # shard the dense working set along canvas-x: relaxation sweeps get
        # XLA-inserted halo exchanges over ICI, convergence is a psum
        from ..parallel.mesh import canvas_sharding

        cs = canvas_sharding(mesh)
        for k in ("occ_val", "vox_type", "dist_sq", "coc"):
            canvas[k] = jax.lax.with_sharding_constraint(canvas[k], cs)
    old_dist = canvas["dist_sq"]
    old_type = canvas["vox_type"]

    present_blk = canvas["present"]
    present_vox_canvas = jnp.repeat(
        jnp.repeat(jnp.repeat(present_blk, VB_WIDTH, 0), VB_WIDTH, 1), VB_WIDTH, 2
    )
    present_vox_win = _crop(present_vox_canvas, win_off, local_size)

    # ---- occupancy fusion (unify_helper.cuh:35-197) ---------------------
    loc_grid = geo.local_coord_grid(local_size)
    glb_pos = geo.coord2pos(loc_grid + pvt[None, None, None, :], cfg.voxel_width)

    win = lambda a: _crop(a, win_off, local_size)
    canvas_win_view = {
        "occ_val": win(canvas["occ_val"]),
        "vox_type": win(canvas["vox_type"]),
    }
    new_occ_win, glb_type, ogm_changed = _fuse(
        canvas_win_view, inst_type, ray_count, input_pointcloud, glb_pos,
        present_vox_win, cfg, fence_ll, fence_ur, fence_active, fence_n,
    )
    canvas["occ_val"] = _uncrop(canvas["occ_val"], new_occ_win["occ_val"], win_off)
    canvas["vox_type"] = _uncrop(canvas["vox_type"], new_occ_win["vox_type"], win_off)

    # ---- batch local EDT (local_edt_core.h) -----------------------------
    batch = batch_edt(glb_type, max_width=cfg.max_width)

    # ---- reconcile with stored global values (MarkLimitedObserve) -------
    seed_dist, seed_coc = reconcile_window(
        batch, win(canvas["dist_sq"]), win(canvas["coc"]), glb_type, pvt, local_size
    )
    dist = _uncrop(canvas["dist_sq"], seed_dist, win_off)
    coc = _uncrop(canvas["coc"], seed_coc, win_off)

    # ---- masks ----------------------------------------------------------
    window_mask = jnp.zeros(canvas_size, jnp.bool_)
    window_mask = _uncrop(window_mask, jnp.ones(local_size, jnp.bool_), win_off)
    observed_canvas = canvas["vox_type"] != VOX_UNKNOWN
    outside_observed = observed_canvas & ~window_mask

    # ---- raise: invalidate disappeared obstacles (wave A) ---------------
    if not cfg.fast_mode:
        dist, coc, _ = invalidate_disappeared(
            dist, coc, outside_observed, glb_type, pvt, local_size
        )

    # ---- lower in/out fixed point (waves B + C) -------------------------
    can_update = window_mask if cfg.fast_mode else (window_mask | outside_observed)
    dist, coc, relax_iters = relax_fixed_point(
        dist, coc, can_update, outside_observed, window_mask, canvas_origin_vox,
        canvas_size=canvas_size, cutoff_sq=cfg.cutoff_grids_sq,
        max_iters=cfg.relax_iters,
    )

    # ---- frontiers (obtainFrontiers FNT marking) ------------------------
    glb_type_out, fnt = mark_frontiers(canvas["vox_type"], lambda a: win(a), glb_type)

    # ---- finalize window write-back (UpdateHashBatch) -------------------
    dist_win = win(dist)
    coc_win = win(coc)
    pair_valid = dist_win != EMPTY_VALUE
    observed_win = glb_type != VOX_UNKNOWN
    writeback = observed_win & pair_valid

    final_dist = _uncrop(
        dist, jnp.where(writeback, dist_win, win(old_dist)), win_off
    )
    final_coc = _uncrop(
        coc, jnp.where(writeback[..., None], coc_win, win(canvas["coc"])), win_off
    )
    vt_win = win(canvas["vox_type"])
    vt_win = jnp.where(fnt & writeback, jnp.int8(VOX_FNT), vt_win)
    canvas["vox_type"] = _uncrop(canvas["vox_type"], vt_win, win_off)
    canvas["dist_sq"] = final_dist
    canvas["coc"] = final_coc

    # EDT output for the motion planner: sqrt of squared grid distance;
    # "sees nothing" voxels get _max_loc_dist_sq exactly like the reference
    # (unify_helper.cuh:467-475,499)
    edt = jnp.where(
        observed_win,
        jnp.where(
            pair_valid,
            jnp.sqrt(dist_win.astype(jnp.float32)),
            jnp.float32(cfg.max_loc_dist_sq),
        ),
        0.0,
    )

    # ---- changed-block tracking for D2H streaming -----------------------
    changed_vox = (final_dist != old_dist) | (canvas["vox_type"] != old_type)
    changed_blk = (
        changed_vox.reshape(bx, VB_WIDTH, by, VB_WIDTH, bz, VB_WIDTH).any((1, 3, 5))
        & present_blk
    )

    # ---- write back to the pool ----------------------------------------
    gmap = scatter_canvas(gmap, directory, canvas_blocks, canvas)
    if mesh is not None:
        from ..parallel.mesh import pool_sharding

        ps = pool_sharding(mesh)
        gmap = dataclasses.replace(
            gmap,
            block_keys=jax.lax.with_sharding_constraint(gmap.block_keys, ps),
            occ_val=jax.lax.with_sharding_constraint(gmap.occ_val, ps),
            vox_type=jax.lax.with_sharding_constraint(gmap.vox_type, ps),
            dist_sq=jax.lax.with_sharding_constraint(gmap.dist_sq, ps),
            coc=jax.lax.with_sharding_constraint(gmap.coc, ps),
        )

    outputs = {
        "edt": edt,                      # float32 [X,Y,Z]
        "glb_type": glb_type_out,        # int8 [X,Y,Z] incl. FNT marks
        "dist_sq": dist_win,             # int32 [X,Y,Z]
        "coc": coc_win,                  # int32 [X,Y,Z,3] global coords
        "ogm_changed": ogm_changed,
        "changed_blk": changed_blk,      # bool [bx,by,bz]
        "directory": directory,          # int32 [bx,by,bz]
        "relax_iters": relax_iters,
        "alloc_dropped": gmap.alloc_dropped,
        "fnt_count": jnp.sum(fnt.astype(jnp.int32)),
    }
    return gmap, outputs


merge_frame = partial(jax.jit, static_argnames=("cfg", "input_pointcloud", "mesh"),
                      donate_argnums=(0,))(merge_frame_impl)


def _fuse(canvas_win, inst_type, ray_count, input_pointcloud, glb_pos,
          present_vox, cfg, fence_ll, fence_ur, fence_active, fence_n):
    """fusion on the window crop; returns ({occ_val, vox_type}, glb_type, changed)."""
    from ..ops import fusion as fu

    old_occ = canvas_win["occ_val"]
    old_type = canvas_win["vox_type"]
    occ_flag = fu._fence_mask(glb_pos, fence_ll, fence_ur, fence_active, fence_n)

    if input_pointcloud:
        hit = (ray_count > 0) | occ_flag
        miss = (ray_count < 0) & ~hit
        pbty = jnp.minimum(1.0, (-ray_count).astype(jnp.float32) / 10.0)
        occ_h, type_h = fu._lowpass(old_occ, old_type, _c.OCC_HIT_VAL, 1.0, cfg.occupancy_threshold)
        occ_m, type_m = fu._lowpass(old_occ, old_type, _c.OCC_FREE_VAL, pbty, cfg.occupancy_threshold)
    else:
        hit = (inst_type == _c.VOX_OCCUPIED) | occ_flag
        miss = (inst_type == VOX_FREE) & ~hit
        occ_h, type_h = fu._lowpass(old_occ, old_type, _c.OCC_HIT_VAL,
                                    _c.LOWPASS_SENSOR_OCC, cfg.occupancy_threshold)
        occ_m, type_m = fu._lowpass(old_occ, old_type, _c.OCC_FREE_VAL,
                                    _c.LOWPASS_SENSOR_FREE, cfg.occupancy_threshold)

    upd = present_vox & (hit | miss)
    new_occ = jnp.where(upd, jnp.where(hit, occ_h, occ_m), old_occ)
    new_type = jnp.where(upd, jnp.where(hit, type_h, type_m), old_type)

    glb_type = jnp.where(present_vox, new_type, VOX_UNKNOWN).astype(jnp.int8)
    changed = present_vox & (new_type != old_type)
    return {"occ_val": new_occ, "vox_type": new_type}, glb_type, changed
