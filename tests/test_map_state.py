"""Canvas geometry + archive directory semantics (the dense replacement for
the reference's hash-table contract, vhashing.h find/insert/alloc paths)."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.map_state import (
    MapState,
    _arch_directory,
    canvas_geometry,
)
from gie_mapping_tpu.utils.config import scan2d_config


def _cfg(max_blocks=64):
    return scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                         max_blocks=max_blocks)


def test_arch_directory_lookup():
    cfg = _cfg()
    cb = cfg.canvas_blocks
    keys = jnp.asarray([[5, -3, 0], [6, -1, 1], [99, 99, 99]], jnp.int32)
    keys = jnp.concatenate([keys, jnp.full((61, 3), 999999, jnp.int32)])
    origin = jnp.asarray([5, -3, 0], jnp.int32)

    d = np.asarray(_arch_directory(keys, jnp.int32(3), origin, cb))
    assert d[0, 0, 0] == 0
    assert d[1, 2, 1] == 1
    assert (d >= 0).sum() == 2  # the far key is outside the canvas region

    # inactive tail (beyond n_arch) is ignored
    d2 = np.asarray(_arch_directory(keys, jnp.int32(1), origin, cb))
    assert (d2 >= 0).sum() == 1

    # shifted canvas still finds keys that fall inside it
    d3 = np.asarray(_arch_directory(keys, jnp.int32(3), origin - 1, cb))
    assert d3[1, 1, 1] == 0


def test_canvas_geometry_window_fits():
    cfg = _cfg()
    for pvt in ([0, 0, 0], [-17, 33, 5], [1023, -1024, 7]):
        origin_blk, origin_vox, off = canvas_geometry(cfg, np.asarray(pvt))
        assert (off >= cfg.halo_grids).all()
        assert (off + np.asarray(cfg.local_size) + cfg.halo_grids
                <= np.asarray(cfg.canvas_size)).all()
        np.testing.assert_array_equal(origin_vox, origin_blk * 8)


def test_canvas_geometry_centred_slack():
    """The canvas is placed with symmetric slack so hysteresis has headroom
    in both directions."""
    cfg = _cfg()
    origin_blk, origin_vox, off = canvas_geometry(cfg, np.asarray([0, 0, 0]))
    lo = off - cfg.halo_grids
    hi = (np.asarray(cfg.canvas_size) - off - np.asarray(cfg.local_size)
          - cfg.halo_grids)
    # neither side pinned to zero while the other has all the slack
    assert (abs(lo - hi) <= 8).all()


def test_state_create_shapes():
    cfg = _cfg()
    s = MapState.create(cfg)
    assert s.occ_val.shape == cfg.canvas_size
    assert s.coc.shape == cfg.canvas_size + (3,)
    assert s.present.shape == cfg.canvas_blocks
    assert s.a_packed.shape == (cfg.max_blocks, 1536)  # flat rows
