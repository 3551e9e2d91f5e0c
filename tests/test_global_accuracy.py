"""Global-map EDT accuracy: streamed global values vs brute-force KNN over
the global occupied cloud — the reference's profile_glb_rms oracle
(volumetric_mapper.h:320-356 + gt_checker.h)."""
import numpy as np

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.runtime.gt_checker import knn_errors
from gie_mapping_tpu.utils.config import scan2d_config


def test_global_edt_matches_global_knn():
    cfg = scan2d_config(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                        cutoff_dist=4.0, max_blocks=4096, fast_mode=False,
                        display_glb_edt=True, display_glb_ogm=True)
    world = BoxWorld.corridor(seed=21, n_pillars=5, extent=3.0)
    mapper = VolumetricMapper(cfg)
    for i, proj in enumerate(circular_trajectory(6, radius=1.2, height=0.7)):
        r, tmin, tinc = world.scan_2d(proj, n_beams=360)
        mapper.process_scan2d(proj, r, tmin, tinc)

    occ = mapper.mirror.occupied_cloud(cfg.voxel_width)
    pos, dist = mapper.mirror.edt_cloud(cfg.voxel_width)
    assert len(occ) > 10 and len(pos) > 100

    rmse, mx, mean_abs = knn_errors(occ, pos, dist)
    # the engine's EDT is exact over its observed site set; the global cloud
    # may contain obstacles beyond the per-frame canvas whose influence is
    # intentionally cutoff-limited, so allow a small tail
    assert rmse < 2.5 * cfg.voxel_width, (rmse, mx)
    # the bulk must be exact: mean abs error well under one voxel
    assert mean_abs < 0.5 * cfg.voxel_width, (mean_abs, mx)
