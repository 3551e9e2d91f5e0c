"""Projective (range-image) pointcloud mode: endpoint exactness + free-space
consistency with the exact DDA walk."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.ops.raycast import pointcloud_project, pointcloud_raycast
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED, VOX_UNKNOWN


def _both(points, local=(32, 32, 16), vw=0.2, n=256):
    buf = np.zeros((n, 3), np.float32)
    buf[: len(points)] = points
    valid = np.zeros(n, bool)
    valid[: len(points)] = True
    pvt = -(np.asarray(local) // 2)
    kw = dict(local_size=tuple(local), voxel_width=vw, ogm_min_h=-10.0,
              ogm_max_h=10.0, for_motion_planner=False, robot_r2_grids=4)
    args = (jnp.asarray(buf), jnp.asarray(valid), jnp.zeros(3, jnp.float32),
            jnp.asarray(pvt, jnp.int32))
    ip, cp = pointcloud_project(*args, **kw)
    id_, cd = pointcloud_raycast(*args, **kw)
    return (np.asarray(ip), np.asarray(cp)), (np.asarray(id_), np.asarray(cd)), pvt


def test_endpoints_identical_to_dda():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2.5, 2.5, (64, 3)).astype(np.float32)
    (ip, cp), (id_, cd), pvt = _both(pts)
    np.testing.assert_array_equal(ip == VOX_OCCUPIED, id_ == VOX_OCCUPIED)
    # positive counts match exactly (same register scatter)
    np.testing.assert_array_equal(np.maximum(cp, 0), np.maximum(cd, 0))


def test_free_space_is_subset_of_dda_ray_corridor():
    """Voxels freed projectively must lie strictly closer than the measured
    surface in their direction; DDA frees them too when ray-aligned."""
    pts = [[3.0, 0.0, 0.0]]
    (ip, cp), (id_, cd), pvt = _both(pts)
    o = tuple(-pvt)
    # on-axis voxels before the endpoint: freed in both modes
    for i in range(1, 12):
        assert id_[o[0] + i, o[1], o[2]] == VOX_FREE
        assert ip[o[0] + i, o[1], o[2]] == VOX_FREE
    # voxels far off-axis stay unknown in both
    assert ip[o[0], o[1] + 10, o[2]] == VOX_UNKNOWN
    # nothing is freed beyond the surface
    end_r = 3.0
    X, Y, Z = ip.shape
    grid = np.stack(np.meshgrid(*[np.arange(s) for s in ip.shape], indexing="ij"), -1)
    pos = (grid + pvt) * 0.2
    r = np.linalg.norm(pos, axis=-1)
    on_beam = (np.abs(pos[..., 1]) < 0.05) & (np.abs(pos[..., 2]) < 0.05)
    assert (ip[(r > end_r) & on_beam] != VOX_FREE).all()


def test_dense_cloud_mostly_agrees_with_dda():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(512, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = v * rng.uniform(1.0, 3.0, (512, 1)).astype(np.float32)
    (ip, cp), (id_, cd), pvt = _both(pts, n=512)
    both_known = (ip != VOX_UNKNOWN) & (id_ != VOX_UNKNOWN)
    agree = (ip[both_known] == id_[both_known]).mean()
    assert agree > 0.97, agree
