"""World-extent ceiling lifted (VERDICT round-1 weak #5 / next-round #7).

Cocs are canvas-relative int16, re-anchored on scroll (archive rows anchor to
their block origin), so the world is bounded only by int32 grid coordinates —
the reference's hash map is likewise extent-unbounded via per-frame wave-range
re-anchoring (local_batch.h:159-208).  These tests drive the mapper far beyond
the old +-30000-voxel limit and assert exact EDT + intact memory.
"""
import numpy as np

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE, VOX_OCCUPIED, VOX_UNKNOWN


def _cfg(**kw):
    base = dict(local_size_m=(4.0, 4.0, 1.2), voxel_width=0.2,
                cutoff_dist=2.0, max_blocks=4096, fast_mode=False)
    base.update(kw)
    return scan2d_config(**base)


def _scan_at(mapper, world, pos):
    proj = geo.Projection(np.eye(3, dtype=np.float32),
                          np.asarray(pos, np.float32))
    r, tmin, tinc = world.scan_2d(proj, n_beams=360)
    return mapper.process_scan2d(proj, r, tmin, tinc)


def _check_window_exact(mapper, cfg, out):
    """Window EDT must match brute force over the window's occupied set for
    voxels whose coc lies inside the window (the window-exactness contract)."""
    types = out.glb_type
    occ_idx = np.argwhere(types == VOX_OCCUPIED)
    assert len(occ_idx) > 10
    coc_loc = out.coc.astype(np.int64) - out.pvt
    in_win = ((coc_loc >= 0) & (coc_loc < np.asarray(cfg.local_size))).all(-1)
    sel = (types != VOX_UNKNOWN) & (out.dist_sq < EMPTY_VALUE) & in_win
    q_idx = np.argwhere(sel)
    assert len(q_idx) > 100
    sub = q_idx[:: max(1, len(q_idx) // 400)]
    best = ((sub[:, None, :] - occ_idx[None, :, :]) ** 2).sum(-1).min(1)
    np.testing.assert_array_equal(best, out.dist_sq[tuple(sub.T)])
    # published cocs are global and self-consistent with dist
    cg = out.coc[tuple(sub.T)].astype(np.int64)
    vg = sub + out.pvt
    np.testing.assert_array_equal(((vg - cg) ** 2).sum(-1),
                                  out.dist_sq[tuple(sub.T)])


def test_long_teleport_beyond_int16():
    """Map at the origin, teleport to x = +40000 voxels (8 km at 0.2 m, past
    the old +-30000 ceiling), map there with exact EDT, then return and find
    the original map intact (archive round-trip across the teleport)."""
    cfg = _cfg()
    world = BoxWorld.corridor(seed=7, n_pillars=5, extent=3.0)
    far = 40000 * cfg.voxel_width  # metres

    class ShiftedWorld:
        def scan_2d(self, proj, **kw):
            p = geo.Projection(proj.rot,
                               np.asarray(proj.trans) - [far, 0.0, 0.0])
            return world.scan_2d(p, **kw)

    mapper = VolumetricMapper(cfg)
    out0 = _scan_at(mapper, world, (0.0, 0.0, 0.6))
    occ0 = out0.local_occupied_cloud(cfg.voxel_width)
    _check_window_exact(mapper, cfg, out0)

    # far site: same geometry shifted by +40000 voxels
    out1 = _scan_at(mapper, ShiftedWorld(), (far, 0.0, 0.6))
    assert out1.pvt[0] > 32767  # genuinely beyond int16 global coords
    _check_window_exact(mapper, cfg, out1)
    occ1 = out1.local_occupied_cloud(cfg.voxel_width)
    np.testing.assert_allclose(occ1 - [far, 0, 0], occ0, atol=1e-3)

    # return: the origin map must come back from the archive bit-intact
    out2 = _scan_at(mapper, world, (0.0, 0.0, 0.6))
    _check_window_exact(mapper, cfg, out2)
    assert mapper.capacity_report()["arch_dropped"] == 0

    # stored state invariant after the round trip: valid pairs reconstruct
    s = mapper.state
    coc = np.asarray(s.coc).astype(np.int64)
    dist = np.asarray(s.dist_sq)
    valid = (np.asarray(s.vox_type) != VOX_UNKNOWN) & (dist < EMPTY_VALUE) \
        & (coc[..., 0] != 32767)
    idx = np.argwhere(valid)
    assert len(idx) > 500
    d2 = ((idx - coc[valid]) ** 2).sum(-1)
    np.testing.assert_array_equal(d2, dist[valid])


def test_mirror_global_cocs_beyond_int16():
    """Streamed mirror blocks publish GLOBAL int32 cocs that stay
    self-consistent at +40000 voxels."""
    cfg = _cfg(display_glb_ogm=True, display_glb_edt=True, vis_interval=1)
    world = BoxWorld.corridor(seed=8, n_pillars=4, extent=3.0)
    far = 40000 * cfg.voxel_width

    class ShiftedWorld:
        def scan_2d(self, proj, **kw):
            p = geo.Projection(proj.rot,
                               np.asarray(proj.trans) - [far, 0.0, 0.0])
            return world.scan_2d(p, **kw)

    mapper = VolumetricMapper(cfg)
    _scan_at(mapper, ShiftedWorld(), (far, 0.0, 0.6))
    _scan_at(mapper, ShiftedWorld(), (far + 0.3, 0.0, 0.6))
    mapper.flush_stream()
    assert len(mapper.mirror) > 0
    checked = 0
    for key, blk in mapper.mirror.blocks.items():
        valid = (blk["dist_sq"] < EMPTY_VALUE) & (blk["coc"][..., 0] != 32767)
        if not valid.any():
            continue
        vidx = np.argwhere(valid)
        vg = vidx + np.asarray(key) * 8
        cg = blk["coc"][valid].astype(np.int64)
        assert cg[:, 0].max() > 32767  # genuinely global int32
        np.testing.assert_array_equal(((vg - cg) ** 2).sum(-1),
                                      blk["dist_sq"][valid])
        checked += len(vidx)
    assert checked > 100
