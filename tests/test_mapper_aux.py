"""Aux subsystems through the mapper: CSV logging, GT checking, external
observer, multiscan-from-cloud, checkpoint/resume, host mirror streaming."""
import numpy as np
import pytest

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils.config import scan2d_config, uav_laser3d_config
from gie_mapping_tpu.utils.constants import VOX_OCCUPIED


def _small(**kw):
    base = dict(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                cutoff_dist=3.0, max_blocks=4096)
    base.update(kw)
    return scan2d_config(**base)


def test_profiling_and_csv_log():
    cfg = _small(profile_loc_rms=True)
    world = BoxWorld.corridor(seed=3, n_pillars=4, extent=4.0)
    mapper = VolumetricMapper(cfg)
    for proj in circular_trajectory(3, radius=1.0):
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        mapper.process_scan2d(proj, r, tmin, tinc)
    assert mapper.gt_checker.last is not None
    rmse, mx, mean_abs = mapper.gt_checker.last
    assert rmse >= 0  # ran; absolute value includes out-of-window memory the
    # window-only KNN cloud cannot see (same artifact as the reference's
    # local-RMS mode)

    # engine exactness: voxels whose closest obstacle lies in the window must
    # match window KNN to float precision
    from gie_mapping_tpu.runtime.gt_checker import knn_errors
    from gie_mapping_tpu.utils.constants import VOX_OCCUPIED, VOX_UNKNOWN

    out = mapper.last_output
    types = out.glb_type
    occ_idx = np.argwhere(types == VOX_OCCUPIED)
    coc_loc = out.coc.astype(np.int64) - out.pvt
    in_win = ((coc_loc >= 0) & (coc_loc < np.asarray(cfg.local_size))).all(-1)
    sel = (types != VOX_UNKNOWN) & (out.dist_sq < 900000) & in_win
    q_idx = np.argwhere(sel)
    rmse2, mx2, _ = knn_errors((occ_idx + out.pvt) * cfg.voxel_width,
                               (q_idx + out.pvt) * cfg.voxel_width,
                               out.edt[sel] * cfg.voxel_width)
    assert mx2 < 1e-3, (rmse2, mx2)

    csv = mapper.logger.getvalue()
    assert csv.startswith("Occupancy time,EDT time,RMSE")
    assert len(csv.strip().splitlines()) == 4  # header + 3 frames


def test_ext_observer_appends_boxes(rng):
    cfg = _small()
    mapper = VolumetricMapper(cfg)
    cluster = rng.normal([1.0, 1.0, 1.0], 0.05, (40, 3)).astype(np.float32)
    n = mapper.process_ext_cloud(cluster)
    assert n == 2  # premap fence + 1 cluster box
    # the appended box participates in fusion as an obstacle
    world = BoxWorld.corridor(seed=3, n_pillars=0, extent=4.0)
    proj = circular_trajectory(1, radius=0.3)[0]
    r, tmin, tinc = world.scan_2d(proj, n_beams=360)
    out = mapper.process_scan2d(proj, r, tmin, tinc)
    # voxels inside the cluster box (around (1,1,*) within z clamp) occupied
    v = np.floor(np.asarray([1.0, 1.0, 1.0]) / cfg.voxel_width + 0.5).astype(int) - out.pvt
    assert out.glb_type[tuple(v)] == VOX_OCCUPIED


def test_multiscan_from_cloud():
    cfg = uav_laser3d_config(local_size_m=(6.0, 6.0, 1.6), voxel_width=0.2,
                             max_blocks=4096, ogm_min_h=-10, ogm_max_h=10)
    world = BoxWorld.corridor(seed=9, n_pillars=5, extent=4.0)
    proj = circular_trajectory(1, radius=0.5, height=0.8)[0]
    # build a synthetic ring cloud from the analytic multiscan image
    img, tmin, tinc, pmin, pinc = world.multiscan(proj, ring_num=16, scan_num=180)
    rr, tt = np.meshgrid(np.arange(16), np.arange(180), indexing="ij")
    ok = ~np.isnan(img)
    theta = tmin + tt[ok] * tinc
    phi = pmin + rr[ok] * pinc
    horiz = img[ok]
    pts = np.stack([horiz * np.cos(theta), horiz * np.sin(theta),
                    horiz * np.tan(phi)], -1).astype(np.float32)
    out = mapper_out = VolumetricMapper(cfg).process_multiscan_cloud(
        proj, pts, rr[ok].astype(np.int32), ring_num=16, scan_num=180,
        phi_min=pmin, phi_inc=pinc)
    assert (out.glb_type == VOX_OCCUPIED).sum() > 0


def test_checkpoint_roundtrip(tmp_path):
    cfg = _small()
    world = BoxWorld.corridor(seed=3, n_pillars=4, extent=4.0)
    m1 = VolumetricMapper(cfg)
    poses = circular_trajectory(4, radius=1.0)
    for proj in poses[:3]:
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        m1.process_scan2d(proj, r, tmin, tinc)
    p = str(tmp_path / "ckpt.npz")
    m1.save(p)

    m2 = VolumetricMapper(cfg).load(p)
    r, tmin, tinc = world.scan_2d(poses[3], n_beams=180)
    o1 = m1.process_scan2d(poses[3], r, tmin, tinc)
    o2 = m2.process_scan2d(poses[3], r, tmin, tinc)
    np.testing.assert_array_equal(o1.dist_sq, o2.dist_sq)
    np.testing.assert_array_equal(o1.glb_type, o2.glb_type)


def test_host_mirror_streaming():
    cfg = _small(display_glb_edt=True, display_glb_ogm=True)
    world = BoxWorld.corridor(seed=3, n_pillars=4, extent=4.0)
    mapper = VolumetricMapper(cfg)
    for proj in circular_trajectory(3, radius=1.0):
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        out = mapper.process_scan2d(proj, r, tmin, tinc)
    assert mapper.mirror is not None and len(mapper.mirror) > 0
    cloud = mapper.mirror.occupied_cloud(cfg.voxel_width)
    assert len(cloud) > 0
    pos, dist = mapper.mirror.edt_cloud(cfg.voxel_width)
    assert len(pos) == len(dist) > 0


def test_async_stream_matches_sync_oracle():
    """The two-phase async streaming path (stream_extract + delayed
    ingest_rows) must produce byte-identical mirror contents to the legacy
    synchronous HostMirror.ingest driven with each frame's state."""
    from gie_mapping_tpu.runtime.host_mirror import HostMirror

    cfg = _small(display_glb_edt=True, display_glb_ogm=True)
    world = BoxWorld.corridor(seed=5, n_pillars=4, extent=4.0)
    mapper = VolumetricMapper(cfg)
    oracle = HostMirror(cfg)
    for proj in circular_trajectory(5, radius=1.6):
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        out = mapper.process_scan2d(proj, r, tmin, tinc)
        oracle.ingest(np.asarray(out.device("changed_blk")), mapper._origin,
                      mapper.state)
    mapper.flush_stream()
    assert getattr(mapper, "_stream_pending", None) is None
    assert set(mapper.mirror.blocks) == set(oracle.blocks)
    for key, blk in oracle.blocks.items():
        got = mapper.mirror.blocks[key]
        for f in ("occ_val", "vox_type", "dist_sq", "coc"):
            np.testing.assert_array_equal(got[f], blk[f], err_msg=f"{key}/{f}")


def test_stream_extract_carry_overflow():
    """Columns beyond the per-tick cap carry over and are served next tick."""
    import jax.numpy as jnp

    from gie_mapping_tpu.map_state import MapState, stream_extract

    cfg = _small()
    state = MapState.create(cfg)
    cb = cfg.canvas_blocks
    changed = np.zeros(cb, bool)
    changed[:, :, 0] = True  # every column changed
    ncols = cb[0] * cb[1]
    k = max(2, ncols // 3)
    carry = jnp.zeros(cb, bool)
    served_cols = set()
    changed_dev = jnp.asarray(changed)
    for tick in range(4):
        ids, valid, rows, blk_mask, leftover = stream_extract(
            state, changed_dev, carry, cfg=cfg, k_cols=k)
        ids, valid = np.asarray(ids), np.asarray(valid)
        served_cols.update(ids[valid].tolist())
        carry = leftover
        changed_dev = jnp.zeros(cb, bool)  # only the first tick has changes
        if not np.asarray(leftover).any():
            break
    assert np.asarray(carry).any() == False  # noqa: E712
    assert served_cols == set(range(ncols))


def test_shift_block_mask():
    import jax.numpy as jnp

    from gie_mapping_tpu.models.mapper import _shift_block_mask

    m = np.zeros((4, 3, 2), bool)
    m[2, 1, 0] = True
    out = np.asarray(_shift_block_mask(jnp.asarray(m),
                                       jnp.asarray([1, 0, 0], np.int32)))
    exp = np.zeros_like(m)
    exp[1, 1, 0] = True  # canvas origin moved +1x: block slides to index-1
    np.testing.assert_array_equal(out, exp)
    # shifting out of range drops the bit
    out2 = np.asarray(_shift_block_mask(jnp.asarray(m),
                                        jnp.asarray([3, 0, 0], np.int32)))
    assert not out2.any()


def test_query_distance_trilinear_exact():
    """On a linear EDT field, trilinear interpolation and its analytic
    gradient are exact; validity tracks window bounds + seen corners."""
    from gie_mapping_tpu.models.mapper import FrameOutput
    from gie_mapping_tpu.utils.constants import VOX_FREE

    vw = 0.2
    shape = (12, 10, 8)
    pvt = np.asarray([5, -3, 2], np.int32)
    gx, gy, gz = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    a, b, c, d = 0.5, -0.25, 1.5, 3.0
    edt = (a * gx + b * gy + c * gz + d).astype(np.float32)
    glb_type = np.full(shape, VOX_FREE, np.int8)
    glb_type[0, 0, 0] = 0  # one UNKNOWN corner voxel
    out = FrameOutput({"edt": edt, "glb_type": glb_type}, origin=pvt * vw,
                      pvt=pvt)

    rng = np.random.default_rng(7)
    g = rng.uniform([1.0, 1.0, 1.0], np.asarray(shape) - 1.0, (64, 3))
    pts = (g + pvt) * vw
    dist, grad, valid = out.query_distance(pts, vw)
    assert valid.all()
    want = (a * g[:, 0] + b * g[:, 1] + c * g[:, 2] + d) * vw
    np.testing.assert_allclose(dist, want, rtol=1e-6)
    np.testing.assert_allclose(grad, np.tile([a, b, c], (64, 1)), atol=1e-9)

    # voxel-centre query returns the grid value exactly
    d0, g0, v0 = out.query_distance((pvt + [3, 4, 5]) * vw, vw)
    np.testing.assert_allclose(d0, edt[3, 4, 5] * vw, rtol=1e-6)
    # outside the window / touching the unseen corner -> invalid
    _, _, v_out = out.query_distance((pvt - 1) * vw, vw)
    assert not v_out
    _, _, v_unseen = out.query_distance((pvt + 0.25) * vw, vw)
    assert not v_unseen


def test_debug_voxel():
    """dbg_pt equivalent: voxel introspection at a world point."""
    cfg = _small()
    world = BoxWorld.corridor(seed=3, n_pillars=4, extent=4.0)
    mapper = VolumetricMapper(cfg)
    for proj in circular_trajectory(2, radius=1.0):
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        out = mapper.process_scan2d(proj, r, tmin, tinc)
    info = out.debug_voxel(np.asarray([0.0, 0.0, 0.9]), cfg.voxel_width)
    assert info is not None
    i, j, k = info["loc"]
    assert info["dist_sq_grids"] == out.dist_sq[i, j, k]
    assert info["glb"] == tuple(np.asarray(info["loc"]) + out.pvt)
    assert out.debug_voxel(np.asarray([99.0, 0.0, 0.0]), cfg.voxel_width) is None


def test_cost_map_payload8_bytes():
    """cost_map_msg reproduces the reference's raw SeenDist memcpy
    (volumetric_mapper.cpp:206-212): 8-byte records, x-fastest order,
    d = grid-unit EDT, o = truthy glb_type, s never written (stays 0)."""
    from gie_mapping_tpu.models.mapper import FrameOutput

    cfg = _small()
    world = BoxWorld.corridor(seed=3, n_pillars=4, extent=4.0)
    mapper = VolumetricMapper(cfg)
    for proj in circular_trajectory(2, radius=1.0):
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        out = mapper.process_scan2d(proj, r, tmin, tinc)

    msg = out.cost_map_msg(cfg.voxel_width)
    X, Y, Z = out.edt.shape
    assert (msg["x_size"], msg["y_size"], msg["z_size"]) == (X, Y, Z)
    assert msg["type"] == 1
    assert len(msg["payload8"]) == 8 * X * Y * Z

    rec = np.frombuffer(msg["payload8"], dtype=FrameOutput.PAYLOAD8_DTYPE)
    # reference linear index: x + y*X + z*X*Y (local_batch.h:168-170)
    x, y, z = 3, 5, 2
    i = x + y * X + z * X * Y
    assert rec["d"][i] == np.float32(out.edt[x, y, z])
    assert rec["o"][i] == (out.glb_type[x, y, z] != 0)
    assert not rec["s"].any()
    # full-array equality in one shot
    np.testing.assert_array_equal(
        rec["d"].reshape(Z, Y, X), out.edt.astype(np.float32).transpose(2, 1, 0))
    np.testing.assert_array_equal(
        rec["o"].reshape(Z, Y, X), (out.glb_type != 0).transpose(2, 1, 0))


def test_ugv_height_override_and_vis_slice():
    """ugv_height clamps the sensor origin's z before the pivot
    (volumetric_mapper.cpp:148-151); vis_height selects the global-EDT
    visualization z layer (volumetric_mapper.h:279-281,339)."""
    import numpy as np

    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld
    from gie_mapping_tpu.utils import geometry as geo
    from gie_mapping_tpu.utils.config import scan2d_config

    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=2048, for_motion_planner=False,
                        ugv_height=0.8, display_glb_edt=True,
                        display_glb_ogm=True, fast_mode=False,
                        cutoff_dist=1.0)
    world = BoxWorld.corridor(seed=4, n_pillars=3, extent=1.2, height=1.4)
    m = VolumetricMapper(cfg)
    # odometry z drifts to 3.1 m; the TRUE sensor rides at ugv_height=0.8
    # (simulate the scan there), and the pivot must anchor at ugv_height
    proj_true = geo.Projection(np.eye(3, dtype=np.float32),
                               np.asarray([0.5, -0.9, 0.8], np.float32))
    proj = geo.Projection(np.eye(3, dtype=np.float32),
                          np.asarray([0.5, -0.9, 3.1], np.float32))
    r, tmin, tinc = world.scan_2d(proj_true, n_beams=120)
    out = m.process_scan2d(proj, r, tmin, tinc)
    want_pvt_z = geo.calculate_pivot(np.asarray([0.5, -0.9, 0.8]),
                                     cfg.voxel_width, cfg.local_size)[2]
    assert out.pvt[2] == want_pvt_z
    # drifted-z pivot would differ
    assert out.pvt[2] != geo.calculate_pivot(
        np.asarray([0.5, -0.9, 3.1]), cfg.voxel_width, cfg.local_size)[2]

    # vis_height z-slice of the mirror EDT cloud
    m.flush_stream()
    z_vox = int(round(cfg.vis_height / cfg.voxel_width))
    pts, d = m.mirror.edt_cloud(cfg.voxel_width, z_slice=z_vox)
    full_pts, _ = m.mirror.edt_cloud(cfg.voxel_width)
    assert len(full_pts) > len(pts) > 0
    np.testing.assert_allclose(pts[:, 2], z_vox * cfg.voxel_width, atol=1e-5)
