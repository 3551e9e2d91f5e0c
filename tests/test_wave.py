"""Incremental global EDT semantics: the three wavefront behaviours of the
reference (raise_outside / lower_outside / lower_inside,
wave_core.cuh:103-393) re-expressed as fixed-point relaxation, validated by
driving merge_frame directly with crafted observations."""
import numpy as np
import pytest
import jax.numpy as jnp

from gie_mapping_tpu.map_state import MapState, canvas_geometry
from gie_mapping_tpu.models.pipeline import merge_frame
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import (
    EMPTY_VALUE,
    VOX_FREE,
    VOX_OCCUPIED,
    VOX_UNKNOWN,
)


import pytest as _pytest

# run every semantics test against BOTH merge engines: the exact canvas-EDT
# default and the reference-mirroring iterative relaxation
@_pytest.fixture(params=["canvas_edt", "relax"], autouse=True)
def _merge_mode(request):
    global _MODE
    _MODE = request.param
    yield request.param


def _cfg(fast=False, cutoff=4.0):
    return scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                         fast_mode=fast, cutoff_dist=cutoff, max_blocks=2048,
                         for_motion_planner=False, merge_mode=_MODE)


def _fence(cfg):
    M = cfg.max_ext_obs
    return (jnp.zeros((M, 3), jnp.float32), jnp.zeros((M, 3), jnp.float32),
            jnp.zeros((M,), jnp.bool_), jnp.int32(0))


def _step(cfg, gmap, inst, pvt):
    pvt = np.asarray(pvt, np.int32)
    origin_blk, _, off = canvas_geometry(cfg, pvt)
    gmap, out = merge_frame(
        gmap, jnp.asarray(inst, jnp.int8), jnp.zeros(cfg.local_size, jnp.int32),
        jnp.asarray(pvt), jnp.asarray(origin_blk), jnp.asarray(off),
        *_fence(cfg), cfg=cfg, input_pointcloud=False,
    )
    return gmap, {k: np.asarray(v) for k, v in out.items()}


def _full_free(cfg):
    return np.full(cfg.local_size, VOX_FREE, np.int8)


def test_lower_outside_propagates_beyond_window():
    """An obstacle seen in the window must lower EDT values of voxels that
    later leave the window (lower_out wave, wave_core.cuh:229-350)."""
    cfg = _cfg(fast=False)
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)

    # frame 1 at pivot A: free window with one obstacle at the window centre
    inst = _full_free(cfg)
    inst[X // 2, Y // 2, Z // 2] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])
    obst_glb = np.asarray([X // 2, Y // 2, Z // 2])

    # frame 2: window shifted +8 voxels in x, fully free, same world
    inst2 = _full_free(cfg)
    inst2[X // 2 - 8, Y // 2, Z // 2] = VOX_OCCUPIED  # same world obstacle
    gmap, out2 = _step(cfg, gmap, inst2, [8, 0, 0])

    # voxels that left the window (x in [0,8) glb) keep correct distances:
    # query the pool through frame-2's output? simpler: shift window back
    inst3 = _full_free(cfg)
    inst3[X // 2, Y // 2, Z // 2] = VOX_OCCUPIED
    gmap, out3 = _step(cfg, gmap, inst3, [0, 0, 0])
    # distances identical to frame 1 (static world => stable EDT)
    np.testing.assert_array_equal(out1["dist_sq"], out3["dist_sq"])


def test_raise_outside_on_disappearing_obstacle():
    """When an obstacle disappears, outside voxels whose coc pointed at it
    must be raised (wave_core.cuh:103-224)."""
    cfg = _cfg(fast=False, cutoff=6.0)
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)

    # frame 1: obstacle near the +x window edge
    inst = _full_free(cfg)
    ox, oy, oz = X - 2, Y // 2, Z // 2
    inst[ox, oy, oz] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])

    # frame 2: window shifts +x so old region is outside; new window sees the
    # same obstacle (now at x = ox-8) --- outside voxels (glb x<8) got their
    # cocs from it
    inst2 = _full_free(cfg)
    inst2[ox - 8, oy, oz] = VOX_OCCUPIED
    gmap, out2 = _step(cfg, gmap, inst2, [8, 0, 0])

    # frame 3: obstacle disappears; outside voxels' cocs must be invalidated
    # and re-lowered (here: no obstacle anywhere -> unseen)
    inst3 = _full_free(cfg)
    gmap, out3 = _step(cfg, gmap, inst3, [8, 0, 0])
    # in-window voxels see nothing -> sentinel edt
    assert (out3["dist_sq"] == EMPTY_VALUE).all()
    np.testing.assert_allclose(out3["edt"], float(cfg.max_loc_dist_sq))

    # frame 4: window returns to original pivot; the voxels that stayed
    # outside during frame 3 must have been raised (not still claiming the
    # dead obstacle)
    inst4 = _full_free(cfg)
    gmap, out4 = _step(cfg, gmap, inst4, [0, 0, 0])
    assert (out4["dist_sq"] == EMPTY_VALUE).all()


def test_limited_observation_keeps_outside_coc():
    """A window that sees no obstacle must keep distances to obstacles
    remembered outside the window (MarkLimitedObserve,
    unify_helper.cuh:201-273)."""
    cfg = _cfg(fast=False, cutoff=6.0)
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)

    inst = _full_free(cfg)
    ox, oy, oz = 2, Y // 2, Z // 2
    inst[ox, oy, oz] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])

    # shift +x: obstacle (glb x=2) now outside the window [8, 8+X)
    inst2 = _full_free(cfg)
    gmap, out2 = _step(cfg, gmap, inst2, [8, 0, 0])

    # near-edge voxels must keep finite distances to the outside obstacle
    d = out2["dist_sq"][0, oy, oz]  # glb x=8, obstacle at glb x=2 -> 36
    assert d == 36
    # and they grow with x
    assert out2["dist_sq"][4, oy, oz] == (8 + 4 - ox) ** 2


def test_fast_mode_still_sees_boundary_seeds():
    """fast_mode skips raise/lower-out but lower_in must still import
    obstacle knowledge from outside the window (obtainFrontiers frontierC,
    unify_helper.cuh:320-399)."""
    cfg = _cfg(fast=True, cutoff=6.0)
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)

    inst = _full_free(cfg)
    ox, oy, oz = 2, Y // 2, Z // 2
    inst[ox, oy, oz] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])

    inst2 = _full_free(cfg)
    gmap, out2 = _step(cfg, gmap, inst2, [8, 0, 0])
    assert out2["dist_sq"][0, oy, oz] == 36


def test_cutoff_limits_outside_propagation():
    """Outside voxels farther than cutoff stop expanding the wave
    (wave_core.cuh:125-126,259-262)."""
    cfg = _cfg(fast=False, cutoff=0.6)  # 3 grids -> cutoff_sq = 9
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)

    inst = _full_free(cfg)
    inst[X // 2, Y // 2, Z // 2] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])
    # inside the window there is no cutoff (lower_inside has none)
    assert (out1["dist_sq"] < EMPTY_VALUE).all()


def test_occupancy_lowpass_hysteresis():
    """A single FREE observation must not clear an OCCUPIED voxel fused at
    0.8 low-pass (250*0.8=200 > thresh=180; then 0.5*200=100 < 180 clears)."""
    cfg = _cfg(fast=True)
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)
    v = (X // 2, Y // 2, Z // 2)

    inst = np.zeros(cfg.local_size, np.int8)
    inst[v] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])
    assert out1["glb_type"][v] == VOX_OCCUPIED

    inst2 = np.zeros(cfg.local_size, np.int8)
    inst2[v] = VOX_FREE
    gmap, out2 = _step(cfg, gmap, inst2, [0, 0, 0])
    # 0.5*0 + 0.5*200 = 100 < 180 -> no longer occupied; the lone free voxel
    # is adjacent to unknowns, so it is additionally marked as an exploration
    # frontier (VOX_FNT), which subsumes FREE
    assert out2["glb_type"][v] in (VOX_FREE, 3)
    assert out2["glb_type"][v] != VOX_OCCUPIED
