"""Long-horizon soak with an online RMSE curve (VERDICT r3 item 9).

A 500-frame synthetic trajectory — random-walk scrolls, two teleports
(out 25 m and back: archive churn + limited observation), world mutation
every 50 frames (appear/disappear raise events), fence churn every 60
frames (ext-obs AABBs activated/cleared) — on the default canvas engine,
logging per-frame gt-checker RMSE (runtime/gt_checker.knn_errors, the
reference's gt_checker.h:30-80 online oracle) and capacity counters.

Asserts, per frame:
  * published EDT vs exact 1-NN over the engine's believed-occupied set
    (canvas + archive) stays at the exact-EDT floor: gap <= 1 voxel,
    RMSE <= 1 voxel width;
and for the whole soak:
  * no CapacityWarning at the preset-class capacities, arch_dropped == 0.

Set GIE_SOAK_ARTIFACT=/path.jsonl to dump the per-frame curve (the
committed capture lives in bench_artifacts/).
"""
import json
import os
import warnings

import numpy as np
import pytest

from gie_mapping_tpu.models.mapper import CapacityWarning, VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld
from gie_mapping_tpu.runtime.gt_checker import knn_errors
from gie_mapping_tpu.utils import geometry as geo
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import EMPTY_VALUE

from test_incremental_horizon import believed_occupied

VW = 0.2
N_FRAMES = 500


@pytest.mark.slow
def test_soak_500_frames_rmse_floor():
    cfg = scan2d_config(local_size_m=(4.8, 4.8, 1.2), voxel_width=VW,
                        cutoff_dist=2.4, max_blocks=8192, fast_mode=False,
                        for_motion_planner=False,
                        edt_gate_min_vox=0)  # production gated engine
    base = BoxWorld.corridor(seed=21, n_pillars=6, extent=3.0, height=1.4)
    worlds = [base]
    import dataclasses
    for k in range(1, 4):  # rotating mutations: drop pillar k, add a box
        w = dataclasses.replace(base, boxes=np.delete(base.boxes, k, axis=0))
        nb = np.asarray([[[-0.8 + 0.5 * k, 0.9, 0.0],
                          [-0.3 + 0.5 * k, 1.4, 1.2]]], np.float32)
        worlds.append(dataclasses.replace(
            w, boxes=np.concatenate([w.boxes, nb])))

    mapper = VolumetricMapper(cfg)
    eye = np.eye(3, dtype=np.float32)
    rng = np.random.default_rng(33)
    pos = np.zeros(2)
    tele = 0.0  # teleport x offset
    curve = []
    art = os.environ.get("GIE_SOAK_ARTIFACT")

    with warnings.catch_warnings():
        warnings.simplefilter("error", CapacityWarning)
        for i in range(N_FRAMES):
            # trajectory: random walk; teleport out at 150, back at 300
            if i == 150:
                tele = 25.0
            elif i == 300:
                tele = 0.0
            else:
                pos = np.clip(pos + rng.uniform(-0.35, 0.35, 2), -2.2, 2.2)
            world = worlds[(i // 50) % len(worlds)]
            if tele:
                world = dataclasses.replace(
                    world, boxes=world.boxes + np.asarray([tele, 0, 0],
                                                          np.float32),
                    bounds_ll=world.bounds_ll + [tele, 0, 0],
                    bounds_ur=world.bounds_ur + [tele, 0, 0])
            # fence churn: append a small AABB near the robot every 60
            # frames, clear back to the default fence every 120
            if i % 120 == 60:
                c = np.asarray([pos[0] + tele + 0.9, pos[1], 0.4], np.float32)
                mapper.ext_obs.append(c - 0.25, c + 0.25)
            elif i % 120 == 0 and i:
                mapper.ext_obs.n = 1  # default flyable fence only

            proj = geo.Projection(
                eye, np.asarray([pos[0] + tele, pos[1], 0.6], np.float32))
            r, tmin, tinc = world.scan_2d(proj, n_beams=360)
            out = mapper.process_scan2d(proj, r, tmin, tinc)

            # online oracle: published window EDT vs exact 1-NN over the
            # believed-occupied set, subsampled for pace
            d = out.dist_sq
            v = (d < EMPTY_VALUE) & out.seen
            occ = believed_occupied(mapper.state, cfg)
            if len(occ) and v.any():
                q = np.argwhere(v)
                sub = slice(None, None, max(1, len(q) // 400))
                vg = (q[sub] + out.pvt) * VW
                edt_m = np.sqrt(d[v][sub].astype(float)) * VW
                rmse, mx, _ = knn_errors(occ * VW, vg, edt_m)
                assert rmse <= VW, (i, rmse)
                assert mx <= VW * (1.0 + 1e-6), (i, mx)
                rep = mapper.capacity_report()
                curve.append({"frame": i, "rmse_m": round(rmse, 5),
                              "max_err_m": round(mx, 5),
                              "n_arch": int(mapper.state.n_arch),
                              "arch_dropped": rep["arch_dropped"],
                              "gate_level": int(out.device("gate_level"))})

    assert mapper.capacity_report()["arch_dropped"] == 0
    assert len(curve) > N_FRAMES * 0.9  # the oracle actually ran throughout
    if art:
        with open(art, "w") as f:
            for row in curve:
                f.write(json.dumps(row) + "\n")
