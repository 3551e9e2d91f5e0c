"""Loud capacity saturation (VERDICT round-1 weak #2 / next-round #5).

The reference fails loudly on every capacity edge (wave_helper.h:26-30,82-88;
unify_helper.cuh:107-113,511-517; blockalloc.h:56-58).  These tests force each
saturation class and assert the engine reports it:

* archive full -> scrolled-out blocks dropped  -> CapacityWarning / raise
* streaming leftover failing to drain N ticks  -> CapacityWarning
* relaxation hitting its sweep cap             -> CapacityWarning
"""
import numpy as np
import pytest

from gie_mapping_tpu.models.mapper import CapacityWarning, VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import scan2d_config


def _small(**kw):
    base = dict(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                cutoff_dist=3.0, max_blocks=4096)
    base.update(kw)
    return scan2d_config(**base)


def _proj(pos):
    return geo.Projection(np.eye(3, dtype=np.float32),
                          np.asarray(pos, np.float32))


def _feed(mapper, world, pos):
    proj = _proj(pos)
    r, tmin, tinc = world.scan_2d(proj, n_beams=120)
    return mapper.process_scan2d(proj, r, tmin, tinc)


def test_archive_drop_warns():
    cfg = _small(max_blocks=8)
    world = BoxWorld.corridor(seed=1, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    _feed(mapper, world, (0.0, 0.0, 0.6))       # populate present blocks
    with pytest.warns(CapacityWarning, match="archive capacity exhausted"):
        _feed(mapper, world, (40.0, 0.0, 0.6))  # teleport: mass archive
        mapper.check_capacity()                  # drain the async guard
    assert mapper.capacity_report()["arch_dropped"] > 0


def test_archive_drop_strict_raises():
    cfg = _small(max_blocks=8, capacity_strict=True)
    world = BoxWorld.corridor(seed=1, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    _feed(mapper, world, (0.0, 0.0, 0.6))
    with pytest.raises(RuntimeError, match="archive capacity exhausted"):
        _feed(mapper, world, (40.0, 0.0, 0.6))
        mapper.check_capacity()


def test_capacity_warn_off_is_silent():
    import warnings

    cfg = _small(max_blocks=8, capacity_warn=False)
    world = BoxWorld.corridor(seed=1, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    _feed(mapper, world, (0.0, 0.0, 0.6))
    with warnings.catch_warnings():
        warnings.simplefilter("error", CapacityWarning)
        _feed(mapper, world, (40.0, 0.0, 0.6))
        mapper.check_capacity()
    assert mapper.capacity_report()["arch_dropped"] > 0  # counted, not loud


def test_stream_stall_warns():
    cfg = _small(display_glb_ogm=True, display_glb_edt=True, vis_interval=1,
                 stream_k_cols=1, stream_stall_ticks=2)
    world = BoxWorld.corridor(seed=2, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    with pytest.warns(CapacityWarning, match="streaming backlog"):
        for i, proj in enumerate(circular_trajectory(5, radius=1.0)):
            r, tmin, tinc = world.scan_2d(proj, n_beams=120)
            mapper.process_scan2d(proj, r, tmin, tinc)
    assert mapper.capacity_report()["stream_stall_ticks"] >= 2


def test_stream_rotation_covers_all_columns():
    """Round-robin service: when more columns change per tick than k_cols,
    every column is still served within ceil(ncols/k) ticks — the fixed
    rank-order tail must not starve."""
    import jax.numpy as jnp

    from gie_mapping_tpu.map_state import MapState, stream_extract

    cfg = _small()
    cb = cfg.canvas_blocks
    ncols = cb[0] * cb[1]
    state = MapState.create(cfg)
    changed = jnp.ones(cb, bool)  # persistent full-canvas change
    carry = jnp.zeros(cb, bool)
    k = 8
    seen = set()
    for t in range(-(-ncols // k)):
        ids, valid, _, _, _ = stream_extract(
            state, changed, carry, jnp.int32((t * k) % ncols),
            cfg=cfg, k_cols=k)
        seen |= set(np.asarray(ids)[np.asarray(valid)].tolist())
    assert seen == set(range(ncols))


def test_relax_cap_warns():
    cfg = _small(merge_mode="relax", fast_mode=False, max_relax_iters=1)
    world = BoxWorld.corridor(seed=3, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    with pytest.warns(CapacityWarning, match="sweep cap"):
        _feed(mapper, world, (0.0, 0.0, 0.6))
        mapper.check_capacity()


def test_csv_capacity_columns():
    from gie_mapping_tpu.runtime.logger import CsvLogger

    log = CsvLogger()
    log.log_frame(1.0, 2.0, -1.0, arch_dropped=3, stream_leftover=7)
    lines = log.getvalue().strip().splitlines()
    assert lines[0].endswith("arch dropped,stream leftover")
    assert lines[1].endswith(",3,7")
