"""Committed-state invariants after random multi-frame runs:

For every observed canvas voxel with a valid stored (dist, coc):
  I1. dist == ||voxel - coc||^2  (the pair is self-consistent)
  I2. if coc lies in the canvas and its block is present, the voxel at coc is
      OCCUPIED (the obstacle actually exists) — modulo kept beyond-canvas
      memories
  I3. dist <= distance to every occupied canvas voxel (no better site was
      missed), for voxels whose writes were enabled this frame
"""
import numpy as np
import pytest
import jax.numpy as jnp

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE, VOX_OCCUPIED, VOX_UNKNOWN

COC_INV = 32767


@pytest.mark.parametrize("fast", [False, True])
def test_committed_state_invariants(fast):
    cfg = scan2d_config(local_size_m=(4.0, 4.0, 1.2), voxel_width=0.2,
                        fast_mode=fast, cutoff_dist=2.0, max_blocks=4096,
                        for_motion_planner=False)
    world = BoxWorld.corridor(seed=13, n_pillars=5, extent=3.0)
    mapper = VolumetricMapper(cfg)
    for i, proj in enumerate(circular_trajectory(6, radius=1.2, height=0.6)):
        r, tmin, tinc = world.scan_2d(proj, n_beams=360)
        mapper.process_scan2d(proj, r, tmin, tinc)

    s = mapper.state
    vox_type = np.asarray(s.vox_type)
    dist = np.asarray(s.dist_sq)
    coc = np.asarray(s.coc).astype(np.int64)
    origin = np.asarray(s.origin_blk).astype(np.int64) * 8
    cs = np.asarray(cfg.canvas_size)

    observed = vox_type != VOX_UNKNOWN
    valid = observed & (dist != EMPTY_VALUE) & (coc[..., 0] != COC_INV)
    if fast:
        # fast_mode never updates outside-window voxels (the reference skips
        # the raise/lower-out waves, glb_hash_map.cu:174-192), so their
        # stored pairs may be stale; check only the freshly-written window
        pvt = mapper.last_output.pvt
        off = pvt - origin
        wmask = np.zeros_like(valid)
        X, Y, Z = cfg.local_size
        wmask[off[0]:off[0] + X, off[1]:off[1] + Y, off[2]:off[2] + Z] = True
        valid &= wmask
    idx = np.argwhere(valid)
    assert len(idx) > (400 if fast else 1000)

    vg = idx + origin            # voxel global coords
    cg = coc[valid] + origin     # stored cocs are canvas-relative

    # I1: pair self-consistency
    d2 = ((vg - cg) ** 2).sum(-1)
    np.testing.assert_array_equal(d2, dist[valid])

    # I2: in-canvas cocs point at occupied voxels
    crel = cg - origin
    in_canvas = ((crel >= 0) & (crel < cs)).all(-1)
    cin = crel[in_canvas]
    types_at_coc = vox_type[cin[:, 0], cin[:, 1], cin[:, 2]]
    assert (types_at_coc == VOX_OCCUPIED).all()

    # I3: no closer occupied canvas voxel exists (exactness), checked on a
    # subsample for speed
    occ_idx = np.argwhere(vox_type == VOX_OCCUPIED)
    if len(occ_idx):
        sub = idx[:: max(1, len(idx) // 500)]
        best = ((sub[:, None, :] - occ_idx[None, :, :]) ** 2).sum(-1).min(1)
        got = dist[sub[:, 0], sub[:, 1], sub[:, 2]]
        assert (got <= best).all()
