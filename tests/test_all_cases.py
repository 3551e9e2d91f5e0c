"""Every benchmark preset runs end-to-end through its sensor pipeline
(size-reduced for CPU CI; full-size runs live in examples/run_case.py)."""
import numpy as np
import pytest

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils.config import load_config
from gie_mapping_tpu.utils.constants import VOX_OCCUPIED

CASES = ["scan2D", "cow_lady", "ugv_corridor", "depthcam", "laser3D",
         "uav_raycast_fine"]


@pytest.mark.parametrize("case", CASES)
def test_case_end_to_end(case):
    cfg = load_config(case, local_size_m=(6.0, 6.0, 1.6), voxel_width=0.2,
                      max_blocks=4096, cutoff_dist=2.0,
                      max_raycast_points=4096)
    world = BoxWorld.corridor(seed=1, n_pillars=4, extent=3.5)
    mapper = VolumetricMapper(cfg)
    for i, proj in enumerate(circular_trajectory(2, radius=0.8, height=0.8)):
        if case in ("cow_lady", "ugv_corridor", "uav_raycast_fine"):
            pts = world.pointcloud(proj, n_rays=4096, seed=i, max_range=5.0)
            out = mapper.process_pointcloud(proj, pts)
        elif case == "scan2D":
            r, tmin, tinc = world.scan_2d(proj, n_beams=180)
            out = mapper.process_scan2d(proj, r, tmin, tinc)
        elif case == "depthcam":
            depth, fx, fy, cx, cy = world.depth_image(proj)
            out = mapper.process_depth(proj, depth, fx, fy, cx, cy)
        else:
            img, tmin, tinc, pmin, pinc = world.multiscan(proj, scan_num=180)
            out = mapper.process_multiscan(proj, img, tmin, tinc, pmin, pinc)

    assert (out.glb_type == VOX_OCCUPIED).sum() > 0
    occ = out.glb_type == VOX_OCCUPIED
    assert np.allclose(out.edt[occ], 0.0)
    assert out.arch_dropped == 0
