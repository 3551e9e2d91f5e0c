"""Micro-profile the projective raycast stages on the TPU.

Times, in one process (throttle cancels within a run):
  a) full pointcloud_project
  b) endpoint scatter-add only (16k points -> 300k grid)
  c) panorama build only (scatter-min + scatter-add into 512x256 bins)
  d) dense carve only (two 300k gathers + trig), panorama precomputed
  e) dense trig only (no gathers) — bounds the gather cost by difference
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gie_mapping_tpu.utils import geometry as geo

K = 10
LOCAL = (100, 100, 30)
VW = 0.1
NT, NP = 512, 256
N = 16384


_LAT = [0.0]


def link_latency():
    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    return min(lat)


def timed(fn, *args, perturb=0):
    """fn's `perturb`-th arg gets a carry-dependent epsilon added so the scan
    body cannot be hoisted as loop-invariant."""

    @jax.jit
    def chain(*a):
        def body(c, _):
            aa = list(a)
            aa[perturb] = aa[perturb] + (c * jnp.float32(1e-7)).astype(aa[perturb].dtype)
            r = fn(*aa)
            s = jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.float32(y.reshape(-1)[0]), r, jnp.float32(0)
            )
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    np.asarray(chain(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return (best - _LAT[0]) / K * 1e3


def main():
    X, Y, Z = LOCAL
    rng = np.random.default_rng(0)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.0, 2.4, N)
    points = jnp.asarray(pts)
    valid = jnp.ones((N,), bool)
    origin = jnp.asarray([0.1, 0.2, 1.2], jnp.float32)
    pvt = jnp.asarray([-50, -50, -3], jnp.int32)

    from gie_mapping_tpu.ops.raycast import pointcloud_project
    full = lambda p, v, o, pv: pointcloud_project(
        p, v, o, pv, local_size=LOCAL, voxel_width=VW, ogm_min_h=0.0,
        ogm_max_h=2.5, for_motion_planner=False, robot_r2_grids=4,
        n_theta=NT, n_phi=NP)

    def endpoints(p, v, pv):
        glb = geo.pos2coord(p, VW)
        loc = glb - pv
        ok = v & geo.inside_volume(loc, jnp.asarray(LOCAL, jnp.int32))
        flat = jnp.where(ok, loc[:, 0] * (Y * Z) + loc[:, 1] * Z + loc[:, 2], 0)
        return jnp.zeros((X * Y * Z,), jnp.int32).at[flat].add(jnp.where(ok, 1, 0))

    def panorama(p, v, o):
        rel = p - o[None, :]
        r = jnp.linalg.norm(rel, axis=-1)
        theta = jnp.arctan2(rel[:, 1], rel[:, 0])
        rho = jnp.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2)
        phi = jnp.arctan2(rel[:, 2], rho)
        bt = jnp.clip((theta + jnp.pi) * (NT / (2 * jnp.pi)), 0, NT - 1).astype(jnp.int32)
        bp = jnp.clip((phi + jnp.pi / 2) * (NP / jnp.pi), 0, NP - 1).astype(jnp.int32)
        b = jnp.where(v, bt * NP + bp, 0)
        big = jnp.float32(1e30)
        depth = jnp.full((NT * NP,), big, jnp.float32).at[b].min(jnp.where(v, r, big))
        cnt = jnp.zeros((NT * NP,), jnp.int32).at[b].add(jnp.where(v, 1, 0))
        return depth, cnt

    depth0, cnt0 = jax.jit(panorama)(points, valid, origin)

    def carve(depth, cnt, o, pv):
        loc = geo.local_coord_grid(LOCAL)
        vpos = geo.coord2pos(loc + pv[None, None, None, :], VW)
        vrel = vpos - o[None, None, None, :]
        vr = jnp.linalg.norm(vrel, axis=-1)
        vtheta = jnp.arctan2(vrel[..., 1], vrel[..., 0])
        vrho = jnp.sqrt(vrel[..., 0] ** 2 + vrel[..., 1] ** 2)
        vphi = jnp.arctan2(vrel[..., 2], vrho)
        vbt = jnp.clip((vtheta + jnp.pi) * (NT / (2 * jnp.pi)), 0, NT - 1).astype(jnp.int32)
        vbp = jnp.clip((vphi + jnp.pi / 2) * (NP / jnp.pi), 0, NP - 1).astype(jnp.int32)
        vbin = vbt * NP + vbp
        vdepth = depth[vbin]
        vcnt = cnt[vbin]
        freed = (vdepth < 1e30) & (vr + VW < vdepth) & (vr <= 0.707 * X * VW)
        return jnp.where(freed, -jnp.minimum(vcnt, 10), 0)

    def trig_only(o, pv):
        loc = geo.local_coord_grid(LOCAL)
        vpos = geo.coord2pos(loc + pv[None, None, None, :], VW)
        vrel = vpos - o[None, None, None, :]
        vr = jnp.linalg.norm(vrel, axis=-1)
        vtheta = jnp.arctan2(vrel[..., 1], vrel[..., 0])
        vrho = jnp.sqrt(vrel[..., 0] ** 2 + vrel[..., 1] ** 2)
        vphi = jnp.arctan2(vrel[..., 2], vrho)
        vbt = jnp.clip((vtheta + jnp.pi) * (NT / (2 * jnp.pi)), 0, NT - 1).astype(jnp.int32)
        vbp = jnp.clip((vphi + jnp.pi / 2) * (NP / jnp.pi), 0, NP - 1).astype(jnp.int32)
        return (vbt * NP + vbp) + vr.astype(jnp.int32)

    # compiled-TPU equality check: pallas carve vs gather carve
    full_pl = lambda p, v, o, pv: pointcloud_project(
        p, v, o, pv, local_size=LOCAL, voxel_width=VW, ogm_min_h=0.0,
        ogm_max_h=2.5, for_motion_planner=False, robot_r2_grids=4,
        n_theta=NT, n_phi=NP, pallas=True)
    full_xla = lambda p, v, o, pv: pointcloud_project(
        p, v, o, pv, local_size=LOCAL, voxel_width=VW, ogm_min_h=0.0,
        ogm_max_h=2.5, for_motion_planner=False, robot_r2_grids=4,
        n_theta=NT, n_phi=NP, pallas=False)
    ia, ca = full_pl(points, valid, origin, pvt)
    ib, cb = full_xla(points, valid, origin, pvt)
    eq = bool(jnp.array_equal(ia, ib)) and bool(jnp.array_equal(ca, cb))
    print("pallas==gather on device:", eq)

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()
    print(f"link rtt: {_LAT[0] * 1e3:.1f} ms", file=sys.stderr)
    for name, fn, args, pi in [
        ("full project (gather)", full_xla, (points, valid, origin, pvt), 0),
        ("full project (pallas)", full_pl, (points, valid, origin, pvt), 0),
        ("endpoint scatter", endpoints, (points, valid, pvt), 0),
        ("panorama build", panorama, (points, valid, origin), 0),
        ("dense carve (gathers)", carve, (depth0, cnt0, origin, pvt), 2),
        ("dense trig only", trig_only, (origin, pvt), 0),
    ]:
        print(f"{name}: {timed(fn, *args, perturb=pi):.2f} ms")


if __name__ == "__main__":
    main()
