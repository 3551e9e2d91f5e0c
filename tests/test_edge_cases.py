"""Edge cases: true 2-D maps (Z==1), vicon->cam extrinsic composition, far
pivots, empty observations, fence box-0 quirk."""
import numpy as np
import pytest
import jax.numpy as jnp

from gie_mapping_tpu.map_state import MapState, canvas_geometry
from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.models.pipeline import merge_frame
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import T_V_C, scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE, VOX_FREE, VOX_OCCUPIED


def test_true_2d_map():
    """Z==1 windows skip phase 3 (reference 2-plan cuTT mode,
    volumetric_mapper.cpp:344-373)."""
    cfg = scan2d_config(local_size_m=(6.0, 6.0, 0.2), voxel_width=0.2,
                        cutoff_dist=2.0, max_blocks=2048,
                        ogm_min_h=-10, ogm_max_h=10)
    assert cfg.is_2d
    world = BoxWorld.corridor(seed=4, n_pillars=3, extent=3.0)
    mapper = VolumetricMapper(cfg)
    proj = circular_trajectory(1, radius=0.5, height=0.0)[0]
    r, tmin, tinc = world.scan_2d(proj, n_beams=360)
    out = mapper.process_scan2d(proj, r, tmin, tinc)
    occ = out.glb_type == VOX_OCCUPIED
    assert occ.any()
    # exactness in 2-D
    occ_idx = np.argwhere(occ)
    sel = (out.glb_type != 0) & (out.dist_sq < cfg.max_loc_dist_sq)
    pts = np.argwhere(sel)
    d2 = ((pts[:, None, :] - occ_idx[None, :, :]) ** 2).sum(-1).min(1)
    got = out.dist_sq[sel]
    assert (got <= d2).all()


def test_vicon_cam_extrinsic_compose():
    """cow-lady T_V_C composition (parameters.h:112-118): transforming a
    camera-frame point through the composed projection equals transforming
    through vicon then the extrinsic."""
    vicon = geo.Projection.from_pose([1.0, -2.0, 0.5],
                                     [0.9238795, 0.0, 0.0, 0.3826834])
    cam = vicon.compose_matrix(T_V_C)
    p_cam = jnp.asarray([[0.3, -0.1, 0.9]], jnp.float32)
    p_vicon = p_cam @ jnp.asarray(T_V_C[:3, :3]).T + jnp.asarray(T_V_C[:3, 3])
    np.testing.assert_allclose(
        np.asarray(cam.l2g(p_cam)), np.asarray(vicon.l2g(p_vicon)), atol=1e-5
    )


def test_far_pivot_roundtrip():
    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=1024)
    # cocs are canvas-relative (re-anchored on scroll), so pivots far beyond
    # int16 are legal; only int32 grid-coordinate overflow is rejected
    for pvt in ([25000, -25000, 100], [40_000_000, 0, 0]):
        origin_blk, origin_vox, off = canvas_geometry(cfg, np.asarray(pvt))
        assert (off >= 0).all()
        assert (np.abs(origin_blk.astype(np.int64) * 8) < 2 ** 31).all()
    with pytest.raises(ValueError):
        canvas_geometry(cfg, np.asarray([1 << 31, 0, 0]))


def test_empty_observation_frame():
    """A frame that observes nothing must leave the map untouched."""
    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=1024)
    world = BoxWorld.corridor(seed=4, n_pillars=2, extent=2.0)
    mapper = VolumetricMapper(cfg)
    proj = circular_trajectory(1, radius=0.3)[0]
    r, tmin, tinc = world.scan_2d(proj, n_beams=90)
    out1 = mapper.process_scan2d(proj, r, tmin, tinc)
    nan = np.full_like(r, np.nan)
    out2 = mapper.process_scan2d(proj, nan, tmin, tinc)
    occ_mask = out1.glb_type == VOX_OCCUPIED
    np.testing.assert_array_equal(out2.glb_type[occ_mask],
                                  out1.glb_type[occ_mask])


def test_fence_box0_inactive():
    """Box 0 (inverted flyable-region fence) stays inactive per the
    reference's activate_AABB quirk (pre_map.cu:85-86): voxels outside box 0
    are NOT forced occupied."""
    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=1024, for_motion_planner=True, robot_r=0.4)
    mapper = VolumetricMapper(cfg)
    # the default fence box is tiny; robot far outside it
    proj = geo.Projection.from_pose([50.0, 50.0, 1.0], [1, 0, 0, 0])
    r = np.full(90, np.nan, np.float32)
    out = mapper.process_scan2d(proj, r, -np.pi, 2 * np.pi / 90)
    # only the robot sphere is observed; nothing forced occupied by box 0
    assert (out.glb_type != VOX_OCCUPIED).all()
    assert (out.glb_type == VOX_FREE).any()
