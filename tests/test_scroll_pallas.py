"""The compact scroll's Pallas archive-I/O path (interpret mode) must be
bit-identical to the XLA dense<->block-major formulation, across ordinary
slab scrolls, diagonal shifts, and archive revisits."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from gie_mapping_tpu.map_state import MapState, _do_scroll
from gie_mapping_tpu.ops.pallas import blockrows
from gie_mapping_tpu.utils.config import scan2d_config


@pytest.fixture
def interp(monkeypatch):
    orig = blockrows.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True  # override the explicit interpret=False default
        return orig(*a, **k)

    monkeypatch.setattr(blockrows.pl, "pallas_call", patched)
    _fns = (blockrows.gather_block_rows, blockrows.scatter_block_rows,
            blockrows.gather_archive_rows, blockrows.scatter_archive_rows,
            blockrows.shift_canvas_pallas)
    for f in _fns:
        f._clear_cache()
    yield
    for f in _fns:
        f._clear_cache()


def _rand_state(cfg, rng):
    cs = cfg.canvas_size
    cb = cfg.canvas_blocks
    st = MapState.create(cfg)
    n_arch = 40
    B = cfg.max_blocks
    keys = rng.integers(-3, 6, (n_arch, 3)).astype(np.int32)
    a_packed = np.asarray(st.a_packed).copy()
    a_packed[:n_arch] = rng.integers(0, 1 << 20, (n_arch, 1536),
                                     dtype=np.uint32)
    return dataclasses.replace(
        st,
        occ_val=jnp.asarray(rng.integers(0, 255, cs, dtype=np.uint8)),
        vox_type=jnp.asarray(rng.integers(0, 4, cs).astype(np.int8)),
        dist_sq=jnp.asarray(rng.integers(0, 900, cs).astype(np.int32)),
        coc=jnp.asarray(rng.integers(-100, 100, cs + (3,)).astype(np.int16)),
        present=jnp.asarray(rng.random(cb) < 0.7),
        arch_keys=st.arch_keys.at[:n_arch].set(jnp.asarray(keys)),
        n_arch=jnp.int32(n_arch),
        a_packed=jnp.asarray(a_packed),
    )


@pytest.mark.parametrize("shift", [(1, 0, 0), (0, -1, 0), (1, 1, -1),
                                   (2, 0, 1),
                                   # multi-block z jumps: static |zb|=2 arm,
                                   # composed Pallas-xy + dynamic-z-roll arm,
                                   # and a beyond-extent teleport (all lanes
                                   # exposed) — no XLA-fallback cliff left
                                   (0, 0, 2), (1, 0, -3), (0, 1, 9)])
def test_compact_scroll_pallas_matches_xla(interp, shift):
    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=4096)
    rng = np.random.default_rng(7)
    st = _rand_state(cfg, rng)
    nb = int(np.prod(cfg.canvas_blocks))
    new_origin = jnp.asarray(np.array(shift, np.int32))

    a = _do_scroll(st, new_origin, cfg, compact_rows=nb, use_pallas=False)
    b = _do_scroll(st, new_origin, cfg, compact_rows=nb, use_pallas=True)
    for f in dataclasses.fields(a):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f.name)), np.asarray(getattr(b, f.name)),
            err_msg=f.name)


def test_compact_scroll_pallas_roundtrip_revisit(interp):
    """Scroll out, scroll back: the Pallas path must restore archived blocks
    exactly (exercises archive write AND read)."""
    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=4096)
    rng = np.random.default_rng(11)
    st = _rand_state(cfg, rng)
    nb = int(np.prod(cfg.canvas_blocks))
    there = jnp.asarray(np.array([2, 1, 0], np.int32))
    back = jnp.asarray(np.zeros(3, np.int32))

    a = _do_scroll(_do_scroll(st, there, cfg, compact_rows=nb,
                              use_pallas=False),
                   back, cfg, compact_rows=nb, use_pallas=False)
    b = _do_scroll(_do_scroll(st, there, cfg, compact_rows=nb,
                              use_pallas=True),
                   back, cfg, compact_rows=nb, use_pallas=True)
    for f in dataclasses.fields(a):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f.name)), np.asarray(getattr(b, f.name)),
            err_msg=f.name)
