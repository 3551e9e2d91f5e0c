"""Incremental-horizon accuracy (VERDICT round-1 weak #3 / next-round #3).

Adversarial multi-frame trajectory: obstacles APPEAR and DISAPPEAR (raise
events), limited observation (obstacles leaving the window but remembered),
canvas scrolls, and a teleport + return.  At every frame, for the published
window EDT:

  (a) canvas engine vs relax engine agree within 1 voxel of distance
      wherever both carry a value (documented divergences 3-5 in
      docs/PARITY.md bound the gap; fresh frames are bitwise equal per
      tests/test_engine_consistency.py);
  (b) both engines are within 1 voxel of a FULL-RECOMPUTE oracle: exact
      1-NN over the engine's own believed-occupied set (canvas + archive);
  (c) KNN RMSE stays below a fixed bound (the BASELINE 'within 1 voxel of
      the reference on replayed horizons' stand-in, gt_checker.h:30-80
      semantics).

Reference behaviours mirrored: raise_outside/lower waves
(wave_core.cuh:103-393), MarkLimitedObserve (unify_helper.cuh:201-273).
"""
import dataclasses

import numpy as np
import pytest

from gie_mapping_tpu.map_state import unpack_voxels
from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld
from gie_mapping_tpu.runtime.gt_checker import knn_errors
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE, VOX_OCCUPIED


VW = 0.2


def _cfg(merge_mode):
    return scan2d_config(local_size_m=(6.0, 6.0, 1.2), voxel_width=VW,
                         cutoff_dist=3.0, max_blocks=4096, fast_mode=False,
                         merge_mode=merge_mode, for_motion_planner=False)


def believed_occupied(state, cfg):
    """GLOBAL voxel coords of every obstacle the engine currently believes
    in: occupied canvas voxels + occupied archived voxels (blocks whose
    canvas copy is live take precedence)."""
    vt = np.asarray(state.vox_type)
    org = np.asarray(state.origin_blk).astype(np.int64)
    pts = np.argwhere(vt == VOX_OCCUPIED) + org * 8
    n = int(state.n_arch)
    if n:
        keys = np.asarray(state.arch_keys[:n]).astype(np.int64)
        typ = np.asarray(unpack_voxels(
            state.a_packed[:n].reshape(n, 512, 3))[1]).reshape(n, 8, 8, 8)
        cb = np.asarray(cfg.canvas_blocks)
        rel = keys - org
        inside = ((rel >= 0) & (rel < cb)).all(-1)
        present = np.asarray(state.present)
        stale = inside.copy()
        stale[inside] = present[tuple(rel[inside].T)]
        w = np.argwhere((typ == VOX_OCCUPIED) & ~stale[:, None, None, None])
        if len(w):
            pts = np.concatenate([pts, keys[w[:, 0]] * 8 + w[:, 1:]])
    return pts


def _check_frame(tag, cfg, out_c, out_r, state_c):
    vw = VW
    d_c = out_c.dist_sq
    d_r = out_r.dist_sq
    v_c = (d_c < EMPTY_VALUE) & out_c.seen
    v_r = (d_r < EMPTY_VALUE) & out_r.seen

    # engines observe identically (shared fusion); value-validity may differ
    # only on divergence-4 voxels (raised-unreached store unseen in relax).
    # MEASURED (round 3): zero mismatched voxels on every frame of this
    # horizon — every raised voxel is re-lowered within cutoff by the relax
    # fixed point, so divergence 4 never materialises here.  Pinned as an
    # exact count (docs/PARITY.md divergence 4 records the number).
    np.testing.assert_array_equal(out_c.seen, out_r.seen, err_msg=tag)
    mismatch_count = int(np.sum(v_c != v_r))
    assert mismatch_count == 0, (tag, mismatch_count)

    # (a) engine-vs-engine: within 1 voxel of distance where both valid
    both = v_c & v_r
    gap = np.abs(np.sqrt(d_c[both].astype(float))
                 - np.sqrt(d_r[both].astype(float)))
    assert gap.max(initial=0.0) <= 1.0, (tag, gap.max())

    # (b) vs full-recompute oracle over the believed-occupied set
    occ = believed_occupied(state_c, cfg)
    assert len(occ)
    for name, dd, vv, out in (("canvas", d_c, v_c, out_c),
                              ("relax", d_r, v_r, out_r)):
        q = np.argwhere(vv)
        vg = q + out.pvt
        sub = slice(None, None, max(1, len(q) // 800))
        d2 = ((vg[sub][:, None, :] - occ[None, :, :]) ** 2).sum(-1).min(1)
        gap = np.abs(np.sqrt(dd[vv][sub].astype(float)) - np.sqrt(d2))
        assert gap.max(initial=0.0) <= 1.0, (tag, name, gap.max())

        # (c) KNN RMSE bound in metres (1 voxel)
        rmse, mx, _ = knn_errors(occ * vw, vg[sub] * vw,
                                 np.sqrt(dd[vv][sub].astype(float)) * vw)
        assert rmse <= vw, (tag, name, rmse)


def test_adversarial_horizon_engines_and_oracle():
    base = BoxWorld.corridor(seed=42, n_pillars=5, extent=3.0)
    removed = dataclasses.replace(base, boxes=base.boxes[1:])  # pillar gone
    new_box = np.asarray([[[0.6, -1.4, 0.0], [1.1, -0.9, 1.2]]], np.float32)
    changed = dataclasses.replace(
        removed, boxes=np.concatenate([removed.boxes, new_box]))

    far = 30.0  # teleport distance (m)
    shifted = dataclasses.replace(
        changed, boxes=changed.boxes + np.asarray([far, 0, 0], np.float32),
        bounds_ll=changed.bounds_ll + [far, 0, 0],
        bounds_ur=changed.bounds_ur + [far, 0, 0])

    # (world, robot xy) per frame: orbit, mutate world (raise + appear),
    # walk (scrolls), teleport out and back (archive + limited observation)
    script = [
        (base, (0.0, 0.0)), (base, (0.6, 0.4)), (base, (-0.5, 0.6)),
        (changed, (0.0, 0.0)), (changed, (0.4, -0.5)),
        (changed, (1.6, 0.0)), (changed, (2.8, 0.6)),   # scroll-inducing walk
        (shifted, (far, 0.0)), (shifted, (far + 0.5, 0.3)),
        (changed, (0.0, 0.0)), (changed, (-0.4, 0.5)),  # return
    ]

    m_c = VolumetricMapper(_cfg("canvas_edt"))
    m_r = VolumetricMapper(_cfg("relax"))
    eye = np.eye(3, dtype=np.float32)
    for i, (world, xy) in enumerate(script):
        proj = geo.Projection(eye, np.asarray([xy[0], xy[1], 0.6], np.float32))
        r, tmin, tinc = world.scan_2d(proj, n_beams=360)
        out_c = m_c.process_scan2d(proj, r, tmin, tinc)
        out_r = m_r.process_scan2d(proj, r, tmin, tinc)
        _check_frame(f"frame {i}", m_c.cfg, out_c, out_r, m_c.state)

    assert m_c.capacity_report()["arch_dropped"] == 0
    assert m_r.capacity_report()["arch_dropped"] == 0
