"""DDA ray-caster semantics vs a reference python Amanatides-Woo walk
(ray_cast.h:56-144 semantics)."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.ops.raycast import pointcloud_raycast
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED, VOX_UNKNOWN


def _py_dda(p0, p1, voxel_width, max_length):
    """Reference-faithful Amanatides-Woo visit list (global voxel coords)."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    c0 = np.floor(p0 / voxel_width + 0.5).astype(int)
    c1 = np.floor(p1 / voxel_width + 0.5).astype(int)
    visits = [tuple(c0)]
    if np.array_equal(c0, c1):
        return visits
    d = p1 - p0
    seg = np.linalg.norm(d)
    dirn = d / seg
    step = np.where(dirn > 0, 1, np.where(dirn < 0, -1, 0)).astype(int)
    t_max = np.full(3, np.inf)
    t_delta = np.full(3, np.inf)
    for i in range(3):
        if step[i] != 0:
            border = c0[i] * voxel_width + step[i] * voxel_width * 0.5
            t_max[i] = (border - p0[i]) / dirn[i]
            t_delta[i] = voxel_width / abs(dirn[i])
    cur = c0.copy()
    while True:
        dim = int(np.argmin(t_max))
        cur[dim] += step[dim]
        t_max[dim] += t_delta[dim]
        visits.append(tuple(cur))
        if np.array_equal(cur, c1):
            break
        if min(t_max) > max_length or min(t_max) > seg:
            break
    return visits


def _run(points, origin=(0.0, 0.0, 0.0), local=(32, 32, 8), vw=0.2,
         pvt=None, fmp=False):
    n = 16
    buf = np.zeros((n, 3), np.float32)
    buf[: len(points)] = points
    valid = np.zeros(n, bool)
    valid[: len(points)] = True
    if pvt is None:
        pvt = -(np.asarray(local) // 2)
    inst, counts = pointcloud_raycast(
        jnp.asarray(buf), jnp.asarray(valid), jnp.asarray(origin, jnp.float32),
        jnp.asarray(pvt, jnp.int32), local_size=tuple(local), voxel_width=vw,
        ogm_min_h=-10.0, ogm_max_h=10.0, for_motion_planner=fmp,
        robot_r2_grids=4,
    )
    return np.asarray(inst), np.asarray(counts), np.asarray(pvt)


def test_single_ray_counts_match_python_dda():
    vw = 0.2
    p1 = [1.73, 0.91, 0.37]
    inst, counts, pvt = _run([p1], vw=vw)
    expect = np.zeros_like(counts)
    endpoint = tuple(np.floor(np.asarray(p1) / vw + 0.5).astype(int) - pvt)
    visits = _py_dda([0, 0, 0], p1, vw, 0.707 * 32 * vw)
    for v in visits:
        loc = tuple(np.asarray(v) - pvt)
        if loc == endpoint:
            continue  # walk stops at the registered endpoint, no decrement
        expect[loc] -= 1
    expect[endpoint] += 1
    np.testing.assert_array_equal(counts, expect)
    assert inst[endpoint] == VOX_OCCUPIED


def test_free_voxels_along_ray():
    inst, counts, pvt = _run([[2.0, 0.0, 0.0]])
    # voxels strictly between origin and endpoint along x must be FREE
    o = tuple(-pvt)
    for i in range(1, 9):
        assert inst[o[0] + i, o[1], o[2]] == VOX_FREE
    end = tuple(np.floor(np.asarray([2.0, 0, 0]) / 0.2 + 0.5).astype(int) - pvt)
    assert inst[end] == VOX_OCCUPIED
    # beyond the endpoint: unobserved
    assert inst[end[0] + 1, end[1], end[2]] == VOX_UNKNOWN


def test_ray_stops_at_occupied():
    """A ray passing through another ray's endpoint must stop there."""
    inst, counts, pvt = _run([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    blk = tuple(np.floor(np.asarray([1.0, 0, 0]) / 0.2 + 0.5).astype(int) - pvt)
    # the blocking voxel keeps its positive count (hit registered, never
    # decremented because walks stop at occupied voxels)
    assert counts[blk] == 1
    assert inst[blk] == VOX_OCCUPIED
    # voxels behind the blocker got no free decrement from the longer ray
    behind = (blk[0] + 1, blk[1], blk[2])
    assert counts[behind] >= 0


def test_height_gate_skips_registration():
    """Endpoints outside [min_h, max_h] are not registered occupied but the
    free walk still happens (freeLocObs has no height gate)."""
    n = 16
    buf = np.zeros((n, 3), np.float32)
    buf[0] = [2.0, 0.0, 0.0]
    valid = np.zeros(n, bool)
    valid[0] = True
    local = (32, 32, 8)
    pvt = -(np.asarray(local) // 2)
    inst, counts = pointcloud_raycast(
        jnp.asarray(buf), jnp.asarray(valid), jnp.zeros(3, jnp.float32),
        jnp.asarray(pvt, jnp.int32), local_size=local, voxel_width=0.2,
        ogm_min_h=5.0, ogm_max_h=10.0, for_motion_planner=False,
        robot_r2_grids=4,
    )
    inst, counts = np.asarray(inst), np.asarray(counts)
    end = tuple(np.floor(np.asarray([2.0, 0, 0]) / 0.2 + 0.5).astype(int) - pvt)
    assert inst[end] == VOX_FREE  # decremented by the walk, not registered
    assert (inst == VOX_OCCUPIED).sum() == 0


def test_motion_planner_sphere():
    inst, counts, pvt = _run([[2.0, 0.0, 0.0]], fmp=True)
    center = tuple(np.asarray([16, 16, 4]))
    assert inst[center] == VOX_FREE
    assert counts[center] == -1  # set, not accumulated (pntcld_raycast.cu:38)
