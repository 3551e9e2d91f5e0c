"""Multi-chip sharding: the full frame update compiled and executed over an
8-device (virtual CPU) mesh must produce bit-identical results to 1 device."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gie_mapping_tpu.map_state import MapState, canvas_geometry
from gie_mapping_tpu.models.pipeline import merge_frame
from gie_mapping_tpu.parallel.mesh import make_mesh, shard_state
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED


def _cfg():
    return scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                         fast_mode=False, cutoff_dist=2.0, max_blocks=2048,
                         for_motion_planner=False)


def _fence(cfg):
    M = cfg.max_ext_obs
    return (jnp.zeros((M, 3), jnp.float32), jnp.zeros((M, 3), jnp.float32),
            jnp.zeros((M,), jnp.bool_), jnp.int32(0))


def _inst(cfg, seed):
    rng = np.random.default_rng(seed)
    inst = np.full(cfg.local_size, VOX_FREE, np.int8)
    occ = rng.random(cfg.local_size) < 0.02
    inst[occ] = VOX_OCCUPIED
    return inst


def _run(cfg, mesh, n_frames=3):
    gmap = MapState.create(cfg)
    if mesh is not None:
        gmap = shard_state(gmap, mesh)
    outs = []
    for i in range(n_frames):
        pvt = np.asarray([4 * i, 0, 0], np.int32)
        origin_blk, _, off = canvas_geometry(cfg, pvt)
        gmap, out = merge_frame(
            gmap, jnp.asarray(_inst(cfg, i)), jnp.zeros(cfg.local_size, jnp.int32),
            jnp.asarray(pvt), jnp.asarray(origin_blk), jnp.asarray(off),
            *_fence(cfg), cfg=cfg, input_pointcloud=False, mesh=mesh,
        )
        outs.append({k: np.asarray(v) for k, v in out.items()
                     if k in ("edt", "glb_type", "dist_sq")})
    return outs


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg = _cfg()
    ref = _run(cfg, None)
    mesh = make_mesh(8)
    shd = _run(cfg, mesh)
    for a, b in zip(ref, shd):
        np.testing.assert_array_equal(a["glb_type"], b["glb_type"])
        np.testing.assert_array_equal(a["dist_sq"], b["dist_sq"])
        np.testing.assert_allclose(a["edt"], b["edt"], rtol=1e-6)


def test_sharded_gate_matches_single_device():
    """The change-gated EDT composes with the mesh: under a mesh the gate
    slices only the y lanes (batch_edt_sharded_slab — x stays sharded) and
    must stay bit-identical to the ungated single-device run."""
    assert len(jax.devices()) >= 8
    cfg = _cfg().replace(edt_gate=True, edt_gate_min_vox=0)
    ref = _run(cfg.replace(edt_gate=False), None)
    shd = _run(cfg, make_mesh(8))
    for a, b in zip(ref, shd):
        for k in ("glb_type", "dist_sq", "edt"):
            np.testing.assert_array_equal(a[k], b[k])


def test_sharded_slab_edt_matches_full():
    """batch_edt_sharded_slab y-slab outputs == batch_edt's same voxels."""
    import jax.numpy as jnp

    from gie_mapping_tpu.ops.edt_batch import batch_edt, batch_edt_sharded_slab

    rng = np.random.default_rng(2)
    X, Y, Z = 64, 48, 16
    occ = rng.random((X, Y, Z)) < 0.02
    glb = jnp.asarray(np.where(occ, VOX_OCCUPIED, VOX_FREE).astype(np.int8))
    full = {k: np.asarray(v) for k, v in
            batch_edt(glb, max_width=X + Y + Z).items()}
    mesh = make_mesh(8)
    for y0, sy in [(0, 16), (8, 24), (32, 16), (0, Y)]:
        slab = batch_edt_sharded_slab(glb, jnp.int32(y0), sy=sy,
                                      max_width=X + Y + Z, mesh=mesh)
        for k in ("dist_sq", "coc", "valid"):
            np.testing.assert_array_equal(
                np.asarray(slab[k]), full[k][:, y0:y0 + sy],
                err_msg=f"y-slab ({y0},{sy}) field {k!r}")


def test_sharded_relax_engine_matches():
    """The iterative relaxation engine (while_loop + halo shifts) must also
    partition correctly: convergence is a psum'd any-reduce."""
    cfg = _cfg().replace(merge_mode="relax")
    ref = _run(cfg, None, n_frames=2)
    shd = _run(cfg, make_mesh(8), n_frames=2)
    for a, b in zip(ref, shd):
        np.testing.assert_array_equal(a["dist_sq"], b["dist_sq"])


def test_mapper_mesh_matches_single(tmp_path):
    """First-class multi-chip at the orchestrator level: VolumetricMapper
    (mesh=...) must evolve bit-identically to the single-device mapper
    through the sensor pipelines, and checkpoints must reload sharded."""
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory

    cfg = _cfg()
    world = BoxWorld.corridor(seed=3, n_pillars=3, extent=2.0, height=1.4)

    def run(mesh):
        m = VolumetricMapper(cfg, mesh=mesh)
        outs = []
        for proj in circular_trajectory(3, radius=0.8, height=0.6):
            r, tmin, tinc = world.scan_2d(proj, n_beams=90)
            o = m.process_scan2d(proj, r, tmin, tinc)
            outs.append((o.dist_sq.copy(), o.glb_type.copy()))
        return m, outs

    _, ref = run(None)
    m1, shd = run(make_mesh(8))
    for (d0, g0), (d1, g1) in zip(ref, shd):
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(g0, g1)

    # checkpoint round trip re-shards over the mesh
    p = str(tmp_path / "mesh_ckpt.npz")
    m1.save(p)
    m2 = VolumetricMapper(cfg, mesh=make_mesh(8)).load(p)
    np.testing.assert_array_equal(np.asarray(m1.state.dist_sq),
                                  np.asarray(m2.state.dist_sq))


def test_sharded_replay_matches():
    """The scanned replay program over an 8-device mesh must be bit-identical
    to the unsharded scan (in-scan scroll included)."""
    from gie_mapping_tpu.models.pipeline import replay_frames

    cfg = _cfg()

    def run(mesh):
        gmap = MapState.create(cfg)
        if mesh is not None:
            gmap = shard_state(gmap, mesh)
        K = 3
        poses = np.zeros((K, 9, 3), np.float32)
        scrolled = np.zeros(K, bool)
        insts = np.stack([_inst(cfg, i) for i in range(K)])
        prev = None
        for i in range(K):
            pvt = np.asarray([4 * i, 0, 0], np.int32)
            origin_blk, _, off = canvas_geometry(cfg, pvt)
            poses[i, 0], poses[i, 1], poses[i, 2] = pvt, origin_blk, off
            scrolled[i] = prev is None or not np.array_equal(prev, origin_blk)
            prev = origin_blk
        gmap, out, changed, per_frame = replay_frames(
            gmap, jnp.asarray(poses), jnp.asarray(scrolled), *_fence(cfg),
            inst_type=jnp.asarray(insts),
            ray_count=jnp.zeros((K,) + cfg.local_size, jnp.int32),
            cfg=cfg, input_pointcloud=False, mesh=mesh)
        return {k: np.asarray(out[k]) for k in ("edt", "glb_type", "dist_sq")}

    ref = run(None)
    shd = run(make_mesh(8))
    for k in ("glb_type", "dist_sq"):
        np.testing.assert_array_equal(ref[k], shd[k], err_msg=k)
    np.testing.assert_allclose(ref["edt"], shd["edt"], rtol=1e-6)
