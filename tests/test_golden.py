"""Golden-replay regression test: a fixed synthetic scenario's outputs are
pinned; any semantic drift in the pipeline fails here.

The fixture is (re)generated with:
    python tests/test_golden.py --regen
(on the CPU backend; integer outputs are deterministic across backends).
"""
import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_scan2d.npz")


def _scenario():
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import scan2d_config

    cfg = scan2d_config(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                        cutoff_dist=3.0, max_blocks=4096)
    world = BoxWorld.corridor(seed=42, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    outs = []
    for proj in circular_trajectory(5, radius=1.2, height=0.7):
        r, tmin, tinc = world.scan_2d(proj, n_beams=240)
        outs.append(mapper.process_scan2d(proj, r, tmin, tinc))
    return outs


GOLDEN_RELAX = os.path.join(os.path.dirname(__file__), "golden_scan2d_relax.npz")


def _scenario_relax():
    """Same trajectory as _scenario but through the reference-mirroring
    relaxation engine (raise/lower wavefront composition)."""
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import scan2d_config

    cfg = scan2d_config(local_size_m=(6.0, 6.0, 1.2), voxel_width=0.2,
                        cutoff_dist=3.0, max_blocks=4096,
                        merge_mode="relax", fast_mode=False)
    world = BoxWorld.corridor(seed=42, n_pillars=5, extent=4.0)
    mapper = VolumetricMapper(cfg)
    outs = []
    for proj in circular_trajectory(5, radius=1.2, height=0.7):
        r, tmin, tinc = world.scan_2d(proj, n_beams=240)
        outs.append(mapper.process_scan2d(proj, r, tmin, tinc))
    return outs


GOLDEN_PC = os.path.join(os.path.dirname(__file__), "golden_pointcloud.npz")


def _scenario_pc():
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import cow_lady_config

    cfg = cow_lady_config(local_size_m=(6.0, 6.0, 1.6), voxel_width=0.2,
                          cutoff_dist=2.0, max_blocks=4096,
                          max_raycast_points=4096,
                          display_glb_edt=False, display_glb_ogm=False)
    world = BoxWorld.corridor(seed=17, n_pillars=4, extent=3.5)
    mapper = VolumetricMapper(cfg)
    outs = []
    for i, proj in enumerate(circular_trajectory(4, radius=1.0, height=0.8)):
        pts = world.pointcloud(proj, n_rays=4096, max_range=4.0, seed=i)
        outs.append(mapper.process_pointcloud(proj, pts))
    return outs


GOLDEN_DEPTH = os.path.join(os.path.dirname(__file__), "golden_depth.npz")


def _scenario_depth():
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import depthcam_config

    cfg = depthcam_config(local_size_m=(5.0, 5.0, 2.0), voxel_width=0.2,
                          cutoff_dist=2.0, max_blocks=4096)
    world = BoxWorld.corridor(seed=23, n_pillars=4, extent=3.0, height=2.0)
    mapper = VolumetricMapper(cfg)
    outs = []
    for proj in circular_trajectory(4, radius=1.0, height=1.0):
        depth, fx, fy, cx, cy = world.depth_image(proj, rows=40, cols=52)
        outs.append(mapper.process_depth(proj, depth, fx, fy, cx, cy))
    return outs


GOLDEN_VLP = os.path.join(os.path.dirname(__file__), "golden_multiscan.npz")


def _scenario_vlp():
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils.config import uav_laser3d_config

    cfg = uav_laser3d_config(local_size_m=(5.0, 5.0, 2.0), voxel_width=0.2,
                             cutoff_dist=2.0, max_blocks=4096)
    world = BoxWorld.corridor(seed=29, n_pillars=4, extent=3.0, height=2.0)
    mapper = VolumetricMapper(cfg)
    outs = []
    for proj in circular_trajectory(4, radius=1.0, height=1.0):
        rings, tmin, tinc, pmin, pinc = world.multiscan(
            proj, ring_num=16, scan_num=180, max_range=8.0)
        outs.append(mapper.process_multiscan(proj, rings, tmin, tinc, pmin,
                                             pinc))
    return outs


def _check(outs, golden_path):
    ref = np.load(golden_path)
    for i in (0, len(outs) - 1):
        np.testing.assert_array_equal(outs[i].glb_type, ref[f"{i}/glb_type"],
                                      err_msg=f"frame {i} glb_type drifted")
        np.testing.assert_array_equal(outs[i].dist_sq, ref[f"{i}/dist_sq"],
                                      err_msg=f"frame {i} dist_sq drifted")
        np.testing.assert_array_equal(outs[i].coc, ref[f"{i}/coc"],
                                      err_msg=f"frame {i} coc drifted")


def test_golden_scan2d():
    assert os.path.exists(GOLDEN), "regenerate with python tests/test_golden.py --regen"
    _check(_scenario(), GOLDEN)


def test_golden_pointcloud():
    assert os.path.exists(GOLDEN_PC), "regenerate with python tests/test_golden.py --regen"
    _check(_scenario_pc(), GOLDEN_PC)


def test_golden_depth():
    assert os.path.exists(GOLDEN_DEPTH), "regenerate with python tests/test_golden.py --regen"
    _check(_scenario_depth(), GOLDEN_DEPTH)


def test_golden_multiscan():
    assert os.path.exists(GOLDEN_VLP), "regenerate with python tests/test_golden.py --regen"
    _check(_scenario_vlp(), GOLDEN_VLP)


def test_golden_relax_engine():
    assert os.path.exists(GOLDEN_RELAX), "regenerate with python tests/test_golden.py --regen"
    _check(_scenario_relax(), GOLDEN_RELAX)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import jax

        jax.config.update("jax_platforms", "cpu")
        for fn, path in ((_scenario, GOLDEN), (_scenario_pc, GOLDEN_PC),
                         (_scenario_depth, GOLDEN_DEPTH),
                         (_scenario_vlp, GOLDEN_VLP),
                         (_scenario_relax, GOLDEN_RELAX)):
            outs = fn()
            data = {}
            for i in (0, len(outs) - 1):
                data[f"{i}/glb_type"] = outs[i].glb_type
                data[f"{i}/dist_sq"] = outs[i].dist_sq
                data[f"{i}/coc"] = outs[i].coc
            np.savez_compressed(path, **data)
            print("golden written:", path)
