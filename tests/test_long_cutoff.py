"""Long-cutoff propagation contract (VERDICT r2 item 3; PARITY divergence 6).

Reference semantics being pinned:

* fast_mode ON (ugv_corridor, scan2D, laser3D presets): the ONLY wave the
  reference runs is lower_inside, and its relaxation is bounded by
  `is_inside_local_volume` (/root/reference/src/kernel/par_wave/
  wave_core.cuh:370; orchestration glb_hash_map.cu:372-399 skips waves A/B)
  — the reference never updates out-of-window hash voxels in fast_mode, no
  matter how large cutoff_dist (ugv's 100 m).  Our fast_mode write-back is
  window-gated the same way: NO divergence, pinned below.
* fast_mode OFF: waves A/B walk allocated hash blocks up to cutoff_grids_sq
  with no window bound (wave_core.cuh:125-126,259-262).  Our propagation
  reaches the resident canvas (window + min(cutoff, MAX_HALO_GRIDS) halo);
  blocks archived out of the canvas keep stale (dist, coc) until they
  scroll back in, where the canvas EDT refreshes them against the current
  site set.  All shipped non-fast presets have cutoff <= halo (cow 20,
  depthcam 60 voxels): full parity.  A custom config narrowing the cutoff
  warns loudly at construction (CutoffNarrowedWarning).
"""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from gie_mapping_tpu.map_state import (
    MapState,
    canvas_geometry,
    np_unpack_voxels,
)
from gie_mapping_tpu.models.pipeline import merge_frame
from gie_mapping_tpu.utils.config import (
    PRESETS,
    CutoffNarrowedWarning,
    MapConfig,
    scan2d_config,
)
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED


def _cfg(fast, cutoff=1.6, merge_mode="canvas_edt"):
    return scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                         fast_mode=fast, cutoff_dist=cutoff, max_blocks=2048,
                         for_motion_planner=False, merge_mode=merge_mode)


def _fence(cfg):
    M = cfg.max_ext_obs
    return (jnp.zeros((M, 3), jnp.float32), jnp.zeros((M, 3), jnp.float32),
            jnp.zeros((M,), jnp.bool_), jnp.int32(0))


def _step(cfg, gmap, inst, pvt):
    pvt = np.asarray(pvt, np.int32)
    origin_blk, _, off = canvas_geometry(cfg, pvt)
    gmap, out = merge_frame(
        gmap, jnp.asarray(inst, jnp.int8),
        jnp.zeros(cfg.local_size, jnp.int32),
        jnp.asarray(pvt), jnp.asarray(origin_blk), jnp.asarray(off),
        *_fence(cfg), cfg=cfg, input_pointcloud=False,
    )
    return gmap, {k: np.asarray(v) for k, v in out.items()}


def _free(cfg):
    return np.full(cfg.local_size, VOX_FREE, np.int8)


# ---------------------------------------------------------------------------
# config-time narrowing is loud
# ---------------------------------------------------------------------------


def test_cutoff_narrowing_warns():
    with pytest.warns(CutoffNarrowedWarning, match="narrowed"):
        MapConfig(voxel_width=0.05, cutoff_dist=100.0, fast_mode=False,
                  local_size_m=(10.0, 10.0, 1.2))
    # at or under the halo bound: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error", CutoffNarrowedWarning)
        MapConfig(voxel_width=0.1, cutoff_dist=6.0, fast_mode=False)
        # fast_mode: the reference wave is window-bounded, nothing narrowed
        MapConfig(voxel_width=0.05, cutoff_dist=100.0, fast_mode=True)


def test_shipped_presets_do_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error", CutoffNarrowedWarning)
        for name, make in PRESETS.items():
            make()


# ---------------------------------------------------------------------------
# fast_mode: window-bounded write-back == reference lower_inside bound
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("merge_mode", ["canvas_edt", "relax"])
def test_fastmode_out_of_window_voxel_keeps_stale(merge_mode):
    """ugv-like contract: with fast_mode the reference never updates hash
    voxels outside the local window (wave C's is_inside_local_volume gate),
    so a disappearing obstacle must NOT raise an out-of-window voxel —
    regardless of cutoff_dist (ugv ships 100 m)."""
    cfg = _cfg(fast=True, cutoff=100.0, merge_mode=merge_mode)
    X, Y, Z = cfg.local_size
    gmap = MapState.create(cfg)

    # frame 1 @ pvt 0: obstacle at glb x=14; v at glb x=2 gets dist 144
    inst = _free(cfg)
    inst[14, Y // 2, Z // 2] = VOX_OCCUPIED
    gmap, out1 = _step(cfg, gmap, inst, [0, 0, 0])
    assert out1["dist_sq"][2, Y // 2, Z // 2] == 144

    # frame 2 @ pvt +8: v (glb x=2) is now OUTSIDE the window; the obstacle
    # voxel (glb 14 -> window x=6) is observed FREE (disappears)
    gmap, out2 = _step(cfg, gmap, _free(cfg), [8, 0, 0])
    dist = np.asarray(gmap.dist_sq)
    coc = np.asarray(gmap.coc)
    origin = np.asarray(gmap.origin_blk) * 8
    vc = np.asarray([2, Y // 2, Z // 2]) - origin
    assert dist[vc[0], vc[1], vc[2]] == 144  # stale, as in the reference
    np.testing.assert_array_equal(
        coc[vc[0], vc[1], vc[2]] + origin, [14, Y // 2, Z // 2])


# ---------------------------------------------------------------------------
# !fast_mode: stale-while-archived, refreshed on re-entry (the declared
# narrowing contract for beyond-halo propagation)
# ---------------------------------------------------------------------------


def test_archived_block_stale_until_reentry():
    cfg = _cfg(fast=False, cutoff=1.6)  # halo 8 voxels; canvas 48 wide
    X, Y, Z = cfg.local_size
    assert cfg.halo_grids == 8 and cfg.canvas_size[0] == 48
    gmap = MapState.create(cfg)
    ym, zm = Y // 2, Z // 2

    # (1) pvt 24: observe obstacle O at glb x=38 (window 24..40)
    inst = _free(cfg)
    inst[38 - 24, ym, zm] = VOX_OCCUPIED
    gmap, _ = _step(cfg, gmap, inst, [24, 0, 0])

    # (2) pvt 8: observe v at glb x=10 free (canvas -8..40 still holds O)
    gmap, out2 = _step(cfg, gmap, _free(cfg), [8, 0, 0])
    assert out2["dist_sq"][2, ym, zm] == 28 ** 2  # coc = O, beyond the halo

    # (3) pvt 36: v's block (glb x 8..16) leaves the canvas (24..72) ->
    # archived; O (window x=2) is observed FREE — it disappears.  The
    # reference's raise wave (cutoff 100 m) would walk the hash and raise v;
    # the declared contract here: v is out of canvas and keeps stale values.
    inst3 = _free(cfg)  # O's voxel observed free
    gmap, _ = _step(cfg, gmap, inst3, [36, 0, 0])

    keys = np.asarray(gmap.arch_keys)
    n = int(np.asarray(gmap.n_arch))
    rows = np.asarray(gmap.a_packed)
    slot = next(i for i in range(n) if (keys[i] == [1, 1, 0]).all())
    occ, typ, dist, coc = np_unpack_voxels(rows[slot].reshape(512, 3))
    # voxel [10, ym, zm] inside block [1,1,0]: sub coords [2, ym-8, zm]
    vi = 2 * 64 + (ym - 8) * 8 + zm
    assert dist[vi] == 28 ** 2  # stale (reference would have raised it)
    np.testing.assert_array_equal(coc[vi] + [8, 8, 0], [38, ym, zm])

    # (4) pvt 8 again: v re-enters the canvas with its stale value and the
    # window observes a NEW obstacle at glb x=20 -> v refreshes same frame
    inst4 = _free(cfg)
    inst4[20 - 8, ym, zm] = VOX_OCCUPIED
    gmap, out4 = _step(cfg, gmap, inst4, [8, 0, 0])
    assert out4["dist_sq"][2, ym, zm] == 100  # (20-10)^2: refreshed
    np.testing.assert_array_equal(out4["coc"][2, ym, zm], [20, ym, zm])
