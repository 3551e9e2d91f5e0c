"""Projection sensor models vs analytic expectations."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.ops import scan_sensors as ss
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED, VOX_UNKNOWN


LOCAL = (40, 40, 8)
VW = 0.2
PVT = np.asarray([-20, -20, -4], np.int32)


def _common(**over):
    kw = dict(local_size=LOCAL, voxel_width=VW, ogm_min_h=-10.0, ogm_max_h=10.0,
              for_motion_planner=False, robot_r2_grids=4)
    kw.update(over)
    return kw


def test_hokuyo_wall():
    """A wall at x=+2m: voxels in the scan plane before it FREE, at it
    OCCUPIED, behind it UNKNOWN."""
    n = 360
    theta_min, theta_inc = -np.pi, 2 * np.pi / n
    th = theta_min + np.arange(n) * theta_inc
    # wall perpendicular to +x at 2m, infinite in y: range = 2/cos(theta)
    r = np.where(np.abs(th) < np.pi / 2 - 0.05, 2.0 / np.cos(th), np.nan)
    proj = geo.Projection.identity()
    param = ss.ScanParam(jnp.float32(theta_min), jnp.float32(theta_inc),
                         jnp.asarray(r, jnp.float32))
    inst = np.asarray(ss.hokuyo_update(proj, param, jnp.asarray(PVT), **_common()))

    zc = 4  # z == 0 plane
    yc = 20
    # x from 0.2m..1.5m: FREE
    for xm in (0.4, 1.0, 1.4):
        xi = int(round(xm / VW)) + 20
        assert inst[xi, yc, zc] == VOX_FREE, xm
    xi = int(round(2.0 / VW)) + 20
    assert inst[xi, yc, zc] == VOX_OCCUPIED
    assert inst[xi + 3, yc, zc] == VOX_UNKNOWN
    # out of plane (z=0.6m > voxel width): unknown
    assert inst[25, yc, zc + 3] == VOX_UNKNOWN


def test_hokuyo_height_gate():
    n = 8
    r = np.full(n, 2.0, np.float32)
    param = ss.ScanParam(jnp.float32(-np.pi), jnp.float32(2 * np.pi / n),
                         jnp.asarray(r))
    proj = geo.Projection.identity()
    inst = np.asarray(ss.hokuyo_update(
        proj, param, jnp.asarray(PVT), **_common(ogm_min_h=5.0, ogm_max_h=9.0)))
    assert (inst != VOX_OCCUPIED).all()  # occupied band outside height gate


def test_realsense_wall():
    rows, cols, fx, fy = 32, 32, 20.0, 20.0
    depth = np.full((rows, cols), 2.0, np.float32)
    param = ss.CamParam(jnp.float32(fx), jnp.float32(fy),
                        jnp.float32(cols / 2), jnp.float32(rows / 2),
                        jnp.asarray(depth))
    proj = geo.Projection.identity()
    inst = np.asarray(ss.realsense_update(proj, param, jnp.asarray(PVT), **_common()))
    yc, zc = 20, 4
    xi = int(round(2.0 / VW)) + 20
    assert inst[xi, yc, zc] == VOX_OCCUPIED
    assert inst[xi - 3, yc, zc] == VOX_FREE
    assert inst[xi + 3, yc, zc] == VOX_UNKNOWN
    # behind the camera: unknown
    assert (inst[:18] == VOX_UNKNOWN).all()


def test_realsense_nan_policy():
    rows, cols = 16, 16
    depth = np.full((rows, cols), np.nan, np.float32)
    param = ss.CamParam(jnp.float32(10.0), jnp.float32(10.0),
                        jnp.float32(8.0), jnp.float32(8.0), jnp.asarray(depth))
    proj = geo.Projection.identity()
    a = np.asarray(ss.realsense_update(proj, param, jnp.asarray(PVT),
                                       **_common(valid_nan=False)))
    assert (a == VOX_UNKNOWN).all()
    b = np.asarray(ss.realsense_update(proj, param, jnp.asarray(PVT),
                                       **_common(valid_nan=True)))
    assert (b == VOX_FREE).any()  # NaN -> far distance -> frustum freed


def test_vlp16_ring_wall():
    ring_num, scan_num = 16, 360
    phi_min, phi_inc = np.deg2rad(-15.0), np.deg2rad(2.0)
    theta_min, theta_inc = -np.pi, 2 * np.pi / scan_num
    rings = np.full((ring_num, scan_num), np.nan, np.float32)
    # horizontal ring (phi=0 -> ring index 7.5 -> nearest rings 7/8); fill all
    rings[:, :] = 2.0
    param = ss.MulScanParam(jnp.float32(theta_min), jnp.float32(theta_inc),
                            jnp.float32(phi_min), jnp.float32(phi_inc),
                            jnp.asarray(rings))
    proj = geo.Projection.identity()
    inst = np.asarray(ss.vlp16_update(proj, param, jnp.asarray(PVT), **_common()))
    yc, zc = 20, 4
    xi = int(round(2.0 / VW)) + 20
    # occupied shell at ~2m horizontal range for voxels near a beam
    assert inst[xi, yc, zc] == VOX_OCCUPIED
    assert inst[xi - 4, yc, zc] == VOX_FREE
    assert inst[xi + 4, yc, zc] == VOX_UNKNOWN


def test_motion_planner_sphere_all_sensors():
    n = 8
    param = ss.ScanParam(jnp.float32(-np.pi), jnp.float32(2 * np.pi / n),
                         jnp.asarray(np.full(n, np.nan, np.float32)))
    proj = geo.Projection.identity()
    inst = np.asarray(ss.hokuyo_update(
        proj, param, jnp.asarray(PVT), **_common(for_motion_planner=True)))
    assert inst[20, 20, 4] == VOX_FREE  # robot centre forced free
