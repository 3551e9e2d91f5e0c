"""Streaming/capacity soak (VERDICT r2 item 5).

A ~130-frame random-walk trajectory with teleports, display_glb_* on and a
deliberately small stream_k_cols, asserting the full streaming contract:

* bounded leftover backlog throughout (never exceeds the column count) and
  full drain within ceil(ncols/k_cols) extra ticks once changes stop
  (round-robin fairness in vivo — test_capacity pins the unit-level
  rotation property);
* after flush, every mirror block still resident in the canvas equals the
  authoritative state bit-for-bit (occ/type/dist + GLOBAL cocs), and every
  present canvas block that ever changed is in the mirror;
* NO CapacityWarning fires during the healthy soak (the loud edges fire
  exactly on forced saturation — test_capacity pins the forced side).

Reference analogue: streamPipeline + the stream-capacity asserts
(glb_hash_map.cu:209-247, unify_helper.cuh:107-113,511-517).
"""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from gie_mapping_tpu.models.mapper import CapacityWarning, VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import VB_WIDTH


@pytest.mark.parametrize("gate", [False, True])
def test_stream_soak_mirror_converges(gate):
    cfg = scan2d_config(
        local_size_m=(4.8, 4.8, 1.2), voxel_width=0.2, fast_mode=True,
        cutoff_dist=1.6, max_blocks=8192, for_motion_planner=False,
        display_glb_ogm=True, display_glb_edt=True, vis_interval=1,
        stream_k_cols=4, stream_stall_ticks=1000,  # stall alert out of play
        edt_gate=gate, edt_gate_min_vox=0,  # gated engine x streaming
    )
    cb = cfg.canvas_blocks
    ncols = cb[0] * cb[1]
    world = BoxWorld.corridor(seed=5, n_pillars=6, extent=3.0, height=1.4)
    mapper = VolumetricMapper(cfg)

    rng = np.random.default_rng(17)
    pos = np.zeros(2)
    ever_changed: set = set()
    max_leftover = 0
    eye = np.eye(3, dtype=np.float32)

    with warnings.catch_warnings():
        warnings.simplefilter("error", CapacityWarning)  # healthy soak: none
        for i in range(130):
            if i in (40, 80):
                pos = np.asarray([8.0, -6.0]) if i == 40 else np.zeros(2)
            else:
                pos = np.clip(pos + rng.uniform(-0.4, 0.4, 2), -2.5, 2.5)
            proj = geo.Projection(eye, np.asarray([pos[0], pos[1], 0.6],
                                                  np.float32))
            r, tmin, tinc = world.scan_2d(proj, n_beams=90, max_range=8.0)
            out = mapper.process_scan2d(proj, r, tmin, tinc)
            origin = np.asarray(mapper.state.origin_blk)
            for b in np.argwhere(np.asarray(out.device("changed_blk"))):
                ever_changed.add(tuple(b + origin))
            max_leftover = max(max_leftover, mapper._last_leftover)
            assert mapper._last_leftover <= ncols
        mapper.check_capacity()

    # drain: no new changes; the rotation must serve the whole backlog
    # within ceil(ncols/k) ticks
    origin = np.asarray(mapper.state.origin_blk)
    zeros = jnp.zeros(tuple(cb), jnp.bool_)
    for _ in range(-(-ncols // 4) + 2):
        mapper._stream({"changed_blk": zeros}, origin)
    mapper.flush_stream()
    assert mapper._last_leftover == 0, "backlog failed to drain"
    assert max_leftover > 0  # the tiny k_cols really did build a backlog

    # mirror == state for every block still resident in the canvas
    st = mapper.state
    occ = np.asarray(st.occ_val)
    typ = np.asarray(st.vox_type)
    dist = np.asarray(st.dist_sq)
    coc = np.asarray(st.coc)
    present = np.asarray(st.present)
    cbn = np.asarray(cb)
    checked = 0
    for key, blk in mapper.mirror.blocks.items():
        rel = np.asarray(key) - origin
        if not ((rel >= 0).all() and (rel < cbn).all()):
            continue  # archived: bounded staleness (PARITY divergence 6)
        if not present[tuple(rel)]:
            continue
        sl = tuple(slice(r * VB_WIDTH, (r + 1) * VB_WIDTH) for r in rel)
        np.testing.assert_array_equal(blk["occ_val"], occ[sl], err_msg=str(key))
        np.testing.assert_array_equal(blk["vox_type"], typ[sl],
                                      err_msg=str(key))
        np.testing.assert_array_equal(blk["dist_sq"], dist[sl],
                                      err_msg=str(key))
        rel_coc = coc[sl]
        valid = rel_coc[..., :1] != 32767
        want = np.where(valid, rel_coc.astype(np.int32) + origin * VB_WIDTH,
                        np.int32(32767))
        np.testing.assert_array_equal(blk["coc"], want, err_msg=str(key))
        checked += 1
    # the comparison really covered a substantial resident set (the thin
    # scan2D observation plane keeps the present set small)
    assert checked >= 8, checked

    # completeness: every present canvas block that ever changed is mirrored
    for key in ever_changed:
        rel = np.asarray(key) - origin
        if ((rel >= 0).all() and (rel < cbn).all()
                and present[tuple(rel)]):
            assert key in mapper.mirror.blocks, key
