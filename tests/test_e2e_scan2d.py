"""End-to-end minimum slice: synthetic 2-D scan -> local OGM -> batch EDT ->
incremental merge -> CostMap output (SURVEY.md §7 step 7)."""
import numpy as np
import pytest

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED, VOX_UNKNOWN, VOX_FNT


@pytest.fixture(scope="module")
def small_cfg():
    # shrink the window so CPU tests stay fast
    return scan2d_config(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                         cutoff_dist=3.0, max_blocks=4096)


def test_scan2d_end_to_end(small_cfg):
    world = BoxWorld.corridor(seed=3, n_pillars=4, extent=4.0)
    mapper = VolumetricMapper(small_cfg)
    outputs = []
    for proj in circular_trajectory(n_frames=4, radius=1.0, height=1.0):
        ranges, tmin, tinc = world.scan_2d(proj, n_beams=180)
        outputs.append(mapper.process_scan2d(proj, ranges, tmin, tinc))

    out = outputs[-1]
    X, Y, Z = small_cfg.local_size
    assert out.edt.shape == (X, Y, Z)
    assert out.glb_type.shape == (X, Y, Z)

    types = out.glb_type
    # the scan must have produced all three classes somewhere
    assert (types == VOX_FREE).any()
    assert (types == VOX_OCCUPIED).any()
    assert (types == VOX_UNKNOWN).any()

    # EDT sanity: zero exactly on occupied voxels, positive on free ones
    occ = types == VOX_OCCUPIED
    assert np.allclose(out.edt[occ], 0.0)
    free = types == VOX_FREE
    assert (out.edt[free] > 0).all()

    # EDT values must match the distance to the nearest occupied voxel as
    # long as the obstacle set is window-contained (brute-force oracle),
    # allowing "sees-nothing" sentinel values through
    # only observed voxels carry committed EDT values (UpdateHashBatch skips
    # UNKNOWN voxels, unify_helper.cuh:463-464)
    seen_valid = (out.dist_sq < small_cfg.max_loc_dist_sq) & (types != VOX_UNKNOWN)
    occ_idx = np.argwhere(occ)
    pts = np.argwhere(seen_valid)
    if len(occ_idx) and len(pts):
        d2 = ((pts[:, None, :] - occ_idx[None, :, :]) ** 2).sum(-1).min(1)
        got = out.dist_sq[pts[:, 0], pts[:, 1], pts[:, 2]]
        # incremental values may be <= batch-window values when obstacles
        # outside the window (remembered from earlier frames) are closer;
        # never larger
        assert (got <= d2).all()
        # where the in-window obstacle is closer than the window boundary, no
        # outside obstacle can win, so the value must be exact
        size = np.asarray(small_cfg.local_size)
        bdist = np.minimum(pts + 1, size[None, :] - pts).min(1)
        interior = d2 < bdist ** 2
        assert interior.any()
        np.testing.assert_array_equal(got[interior], d2[interior])

    assert out.arch_dropped == 0


def test_scan2d_frontier_marks(small_cfg):
    world = BoxWorld.corridor(seed=5, n_pillars=2, extent=4.0)
    mapper = VolumetricMapper(small_cfg)
    proj = circular_trajectory(1, radius=0.5)[0]
    ranges, tmin, tinc = world.scan_2d(proj, n_beams=90)
    out = mapper.process_scan2d(proj, ranges, tmin, tinc)
    # a half-resolution scan must leave unknown regions adjacent to free ones
    assert out.fnt_count > 0
    assert (out.glb_type == VOX_FNT).sum() == out.fnt_count


def test_incremental_consistency(small_cfg):
    """Re-observing a static world must keep the EDT stable (fixed point)."""
    world = BoxWorld.corridor(seed=7, n_pillars=3, extent=4.0)
    mapper = VolumetricMapper(small_cfg)
    proj = circular_trajectory(1, radius=0.5)[0]
    ranges, tmin, tinc = world.scan_2d(proj, n_beams=360)
    out1 = mapper.process_scan2d(proj, ranges, tmin, tinc)
    out2 = mapper.process_scan2d(proj, ranges, tmin, tinc)
    np.testing.assert_array_equal(out1.glb_type, out2.glb_type)
    np.testing.assert_array_equal(out1.dist_sq, out2.dist_sq)
