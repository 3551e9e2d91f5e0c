"""Resident-canvas scrolling + block archive: memory must survive leaving and
re-entering a region (the hash-map persistence contract of the reference)."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.map_state import MapState, scroll_canvas
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE, VOX_OCCUPIED, VOX_UNKNOWN


def _cfg(max_blocks=512):
    return scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                         max_blocks=max_blocks)


def _mark(state, pos, val):
    state.vox_type = state.vox_type.at[pos].set(val)
    state.dist_sq = state.dist_sq.at[pos].set(7)
    bx, by, bz = (p // 8 for p in pos)
    state.present = state.present.at[bx, by, bz].set(True)
    return state


def test_zero_shift_is_identity():
    cfg = _cfg()
    s = MapState.create(cfg)
    s = _mark(s, (9, 9, 9), VOX_OCCUPIED)
    s2 = scroll_canvas(s, jnp.zeros(3, jnp.int32), cfg)
    np.testing.assert_array_equal(np.asarray(s2.vox_type), np.asarray(s.vox_type))
    assert int(s2.n_arch) == 0


def test_shift_moves_content():
    cfg = _cfg()
    s = MapState.create(cfg)
    s = _mark(s, (17, 9, 9), VOX_OCCUPIED)
    # shift canvas +1 block in x: content moves to x-8
    s2 = scroll_canvas(s, jnp.asarray([1, 0, 0], jnp.int32), cfg)
    assert int(s2.vox_type[9, 9, 9]) == VOX_OCCUPIED
    assert int(s2.vox_type[17, 9, 9]) == VOX_UNKNOWN
    assert bool(s2.present[1, 1, 1])
    assert not bool(s2.present[2, 1, 1])


def test_leave_and_return_restores_from_archive():
    cfg = _cfg()
    s = MapState.create(cfg)
    s = _mark(s, (9, 9, 9), VOX_OCCUPIED)  # block (1,1,1), key (1,1,1)+origin0

    far = jnp.asarray([100, 0, 0], jnp.int32)
    s2 = scroll_canvas(s, far, cfg)
    assert int(s2.n_arch) >= 1  # the present block got archived
    assert (np.asarray(s2.vox_type) == VOX_UNKNOWN).all()

    s3 = scroll_canvas(s2, jnp.zeros(3, jnp.int32), cfg)
    assert int(s3.vox_type[9, 9, 9]) == VOX_OCCUPIED
    assert int(s3.dist_sq[9, 9, 9]) == 7
    assert bool(s3.present[1, 1, 1])


def test_rearchive_overwrites_same_slot():
    cfg = _cfg()
    s = MapState.create(cfg)
    s = _mark(s, (9, 9, 9), VOX_OCCUPIED)
    far = jnp.asarray([100, 0, 0], jnp.int32)
    s = scroll_canvas(s, far, cfg)
    n1 = int(s.n_arch)
    s = scroll_canvas(s, jnp.zeros(3, jnp.int32), cfg)
    # mutate and leave again: must reuse the same archive slot
    s.vox_type = s.vox_type.at[9, 9, 9].set(VOX_UNKNOWN)
    s.occ_val = s.occ_val.at[9, 9, 9].set(42)
    s = scroll_canvas(s, far, cfg)
    assert int(s.n_arch) == n1
    s = scroll_canvas(s, jnp.zeros(3, jnp.int32), cfg)
    assert int(s.occ_val[9, 9, 9]) == 42


def test_archive_capacity_overflow_counts():
    cfg = _cfg(max_blocks=2)
    s = MapState.create(cfg)
    for p in ((1, 1, 1), (9, 1, 1), (17, 1, 1), (25, 1, 1)):
        s = _mark(s, p, VOX_OCCUPIED)
    s = scroll_canvas(s, jnp.asarray([1000, 0, 0], jnp.int32), cfg)
    assert int(s.n_arch) == 2
    assert int(s.arch_dropped) == 2


def test_compact_scroll_bitwise_equals_full():
    """The compacted-archive-IO scroll path is bit-identical to the full
    path for ordinary slab scrolls (host only selects it when the
    exiting/entering bound fits)."""
    import dataclasses

    from gie_mapping_tpu.map_state import _do_scroll

    cfg = _cfg(max_blocks=256)
    rng = np.random.default_rng(21)
    s = MapState.create(cfg)
    # populate scattered content + presence
    for _ in range(40):
        pos = tuple(int(v) for v in rng.integers(0, np.asarray(cfg.canvas_size)))
        s = _mark(s, pos, VOX_OCCUPIED)

    shifts = [(1, 0, 0), (-1, 1, 0), (0, -1, 1), (2, 0, -1), (1, 1, 1)]
    sf = sc = s
    origin = np.zeros(3, int)
    for sh in shifts:
        origin = origin + np.asarray(sh)
        tgt = jnp.asarray(origin, jnp.int32)
        sf = _do_scroll(sf, tgt, cfg)
        nb = int(np.prod(cfg.canvas_blocks))
        sc = _do_scroll(sc, tgt, cfg, compact_rows=min(256, nb))
        for f in dataclasses.fields(sf):
            a = np.asarray(getattr(sf, f.name))
            b = np.asarray(getattr(sc, f.name))
            np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_window_outputs_independent_of_canvas_slack():
    """The canvas is an implementation detail: the same frame sequence must
    produce identical WINDOW outputs whatever hysteresis slack the canvas
    carries (cfg.canvas_slack_blocks — depthcam ships 1 since round 5)."""
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory

    outs = []
    for slack in (0, 1, 2):
        cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                            max_blocks=2048, canvas_slack_blocks=slack,
                            display_glb_edt=False, display_glb_ogm=False)
        world = BoxWorld.corridor(seed=5, n_pillars=4, extent=1.4, height=1.6)
        poses = circular_trajectory(n_frames=6, radius=0.9, height=0.8,
                                    closed=True)
        m = VolumetricMapper(cfg)
        per = []
        for i, p in enumerate(poses):
            scan, tmin, tinc = world.scan_2d(p, n_beams=180)
            out = m.process_scan2d(p, scan, tmin, tinc)
            # window outputs are global-anchored (coc in global voxel
            # coords), so they must match bitwise across canvas sizes
            per.append((np.asarray(out.glb_type), np.asarray(out.dist_sq),
                        np.asarray(out.coc)))
        outs.append(per)
    for slack_i in (1, 2):
        for f, (a, b) in enumerate(zip(outs[0], outs[slack_i])):
            for name, x, y in zip(("type", "dist", "coc"), a, b):
                np.testing.assert_array_equal(
                    x, y, err_msg=f"slack {slack_i} frame {f} {name}")
