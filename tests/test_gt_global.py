"""profile_glb_rms: ground-truth checking of the streamed GLOBAL mirror
(VERDICT round-1 missing #2 / next-round #4).

The reference's profiling tick gt-checks the published global cloud
(volumetric_mapper.h:320-356 over publish_glb_2_rviz) — distinct from the
local-window check.  These tests pin that the global route (a) runs through
the mapper on the vis cadence, and (b) actually validates the STREAMED data:
corrupting one streamed block must move the global RMSE/max error while the
window check stays blind to it.
"""
import numpy as np

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils.config import scan2d_config


def _cfg(**kw):
    base = dict(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                cutoff_dist=3.0, max_blocks=4096,
                display_glb_ogm=True, display_glb_edt=True, vis_interval=1,
                profile_glb_rms=True)
    base.update(kw)
    return scan2d_config(**base)


def _run_frames(mapper, n=4):
    world = BoxWorld.corridor(seed=5, n_pillars=4, extent=4.0)
    for proj in circular_trajectory(n, radius=1.0):
        r, tmin, tinc = world.scan_2d(proj, n_beams=180)
        mapper.process_scan2d(proj, r, tmin, tinc)
    mapper.flush_stream()
    return mapper


def test_global_rms_routes_to_mirror():
    mapper = _run_frames(VolumetricMapper(_cfg()))
    # the global check ran (its own slot, not the window check's)
    assert mapper.gt_checker.last_global is not None
    assert mapper.gt_checker.last is None  # profile_loc_rms off
    rmse, mx, mean_abs = mapper.gt_checker.last_global
    assert rmse >= 0
    # CSV got the global RMSE column
    csv = mapper.logger.getvalue().strip().splitlines()
    assert any(float(line.split(",")[2]) >= 0 for line in csv[1:])


def test_global_rms_flags_corrupted_stream():
    """Corrupt ONE streamed block in the mirror: the global check must see a
    max-error jump of the injected magnitude (the window check cannot)."""
    mapper = _run_frames(VolumetricMapper(_cfg()))
    base_rmse, base_mx, _ = mapper.gt_checker.check_global(
        mapper.mirror, mapper.cfg.voxel_width)

    # inject: +8 m^2-grids of squared distance into one block with valid EDT
    from gie_mapping_tpu.utils.constants import EMPTY_VALUE

    for key, blk in mapper.mirror.blocks.items():
        valid = blk["dist_sq"] < EMPTY_VALUE
        if valid.sum() > 10:
            blk["dist_sq"] = np.where(
                valid, blk["dist_sq"] + 40 ** 2, blk["dist_sq"])
            break
    else:  # pragma: no cover
        raise AssertionError("no streamed block with valid EDT values")

    rmse2, mx2, _ = mapper.gt_checker.check_global(
        mapper.mirror, mapper.cfg.voxel_width)
    # 40 grids * 0.2 m = 8 m of injected error (in sqrt terms, several m)
    assert mx2 > base_mx + 1.0, (base_mx, mx2)
    assert rmse2 > base_rmse


def test_loc_and_glb_rms_both_run():
    mapper = _run_frames(VolumetricMapper(_cfg(profile_loc_rms=True)))
    assert mapper.gt_checker.last is not None
    assert mapper.gt_checker.last_global is not None
