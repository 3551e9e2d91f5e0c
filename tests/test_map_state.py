"""Block pool + directory semantics (the reference's hash-table contract,
vhashing.h find/insert/alloc paths, re-expressed densely)."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.map_state import (
    GlobalMap,
    allocate_blocks,
    build_directory,
    canvas_geometry,
    gather_canvas,
    scatter_canvas,
)
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE, VOX_UNKNOWN


def _cfg(max_blocks=64):
    return scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                         max_blocks=max_blocks)


def test_alloc_and_lookup_roundtrip():
    cfg = _cfg()
    gmap = GlobalMap.create(cfg)
    origin_blk = jnp.asarray([5, -3, 0], jnp.int32)
    cb = cfg.canvas_blocks

    directory = build_directory(gmap, origin_blk, cb)
    assert (np.asarray(directory) == -1).all()

    needed = np.zeros(cb, bool)
    needed[0, 0, 0] = needed[1, 2, 1] = True
    gmap, directory = allocate_blocks(gmap, jnp.asarray(directory),
                                      jnp.asarray(needed), origin_blk)
    assert int(gmap.n_blocks) == 2
    d = np.asarray(directory)
    assert d[0, 0, 0] >= 0 and d[1, 2, 1] >= 0
    assert (d >= 0).sum() == 2

    keys = np.asarray(gmap.block_keys)[:2]
    expect = {(5, -3, 0), (6, -1, 1)}
    assert set(map(tuple, keys)) == expect

    # rebuilding the directory from keys must find the same slots
    d2 = np.asarray(build_directory(gmap, origin_blk, cb))
    np.testing.assert_array_equal(d2, d)

    # a shifted canvas still finds blocks that fall inside it
    d3 = np.asarray(build_directory(gmap, origin_blk - 1, cb))
    assert d3[1, 1, 1] == d[0, 0, 0]


def test_alloc_idempotent_and_capacity():
    cfg = _cfg(max_blocks=3)
    gmap = GlobalMap.create(cfg)
    origin_blk = jnp.asarray([0, 0, 0], jnp.int32)
    cb = cfg.canvas_blocks

    needed = np.zeros(cb, bool)
    needed[:2, :2, 0] = True  # 4 blocks wanted, capacity 3
    directory = build_directory(gmap, origin_blk, cb)
    gmap, directory = allocate_blocks(gmap, directory, jnp.asarray(needed), origin_blk)
    assert int(gmap.n_blocks) == 3
    assert int(gmap.alloc_dropped) == 1

    # asking again: already-present blocks are not reallocated
    gmap2, _ = allocate_blocks(gmap, directory, jnp.asarray(needed), origin_blk)
    assert int(gmap2.n_blocks) == 3


def test_canvas_gather_scatter_roundtrip():
    cfg = _cfg()
    gmap = GlobalMap.create(cfg)
    origin_blk = jnp.asarray([2, 2, 2], jnp.int32)
    cb = cfg.canvas_blocks
    needed = np.zeros(cb, bool)
    needed[1, 1, 1] = True
    directory = build_directory(gmap, origin_blk, cb)
    gmap, directory = allocate_blocks(gmap, directory, jnp.asarray(needed), origin_blk)

    canvas = gather_canvas(gmap, directory, cb)
    # absent blocks read as defaults
    assert int(canvas["vox_type"][0, 0, 0]) == VOX_UNKNOWN
    assert int(canvas["dist_sq"][0, 0, 0]) == EMPTY_VALUE

    # write a value into the allocated block's dense region and round-trip
    canvas["dist_sq"] = canvas["dist_sq"].at[8 + 3, 8 + 4, 8 + 5].set(42)
    gmap = scatter_canvas(gmap, directory, cb, canvas)
    canvas2 = gather_canvas(gmap, directory, cb)
    assert int(canvas2["dist_sq"][8 + 3, 8 + 4, 8 + 5]) == 42
    # absent regions unchanged in the pool
    assert int(gmap.dist_sq[int(np.asarray(directory)[1, 1, 1]), 3, 4, 5]) == 42


def test_canvas_geometry_window_fits():
    cfg = _cfg()
    for pvt in ([0, 0, 0], [-17, 33, 5], [1023, -1024, 7]):
        origin_blk, origin_vox, off = canvas_geometry(cfg, np.asarray(pvt))
        assert (off >= 0).all()
        assert (off + np.asarray(cfg.local_size) <=
                np.asarray(cfg.canvas_size)).all()
        np.testing.assert_array_equal(origin_vox, origin_blk * 8)
