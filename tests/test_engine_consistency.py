"""Cross-engine and cross-mode consistency properties."""
import numpy as np
import pytest
import jax.numpy as jnp

from gie_mapping_tpu.map_state import MapState, canvas_geometry
from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.models.pipeline import merge_frame
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import VOX_FREE, VOX_OCCUPIED, VOX_UNKNOWN


def _fence(cfg):
    M = cfg.max_ext_obs
    return (jnp.zeros((M, 3), jnp.float32), jnp.zeros((M, 3), jnp.float32),
            jnp.zeros((M,), jnp.bool_), jnp.int32(0))


@pytest.mark.parametrize("fast", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engines_agree_on_first_frame(fast, seed):
    """From an empty map, the canvas-EDT and relaxation engines must produce
    the SAME distances for observed window voxels (both converge to the exact
    Voronoi of the observed obstacle set)."""
    outs = {}
    for mode in ("canvas_edt", "relax"):
        cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                            fast_mode=fast, cutoff_dist=4.0, max_blocks=2048,
                            for_motion_planner=False, merge_mode=mode)
        rng = np.random.default_rng(seed)
        inst = np.full(cfg.local_size, VOX_FREE, np.int8)
        inst[rng.random(cfg.local_size) < 0.03] = VOX_OCCUPIED
        inst[rng.random(cfg.local_size) < 0.2] = VOX_UNKNOWN
        pvt = np.zeros(3, np.int32)
        ob, _, off = canvas_geometry(cfg, pvt)
        state = MapState.create(cfg)
        _, out = merge_frame(
            state, jnp.asarray(inst), jnp.zeros(cfg.local_size, jnp.int32),
            jnp.asarray(pvt), jnp.asarray(ob), jnp.asarray(off),
            *_fence(cfg), cfg=cfg, input_pointcloud=False,
        )
        outs[mode] = {k: np.asarray(v) for k, v in out.items()}
        observed = np.asarray(inst) != VOX_UNKNOWN

    a, b = outs["canvas_edt"], outs["relax"]
    np.testing.assert_array_equal(a["glb_type"], b["glb_type"])
    np.testing.assert_array_equal(a["dist_sq"][observed], b["dist_sq"][observed])


def test_dda_mode_through_mapper():
    """raycast_mode='dda' exercises the exact walk end-to-end."""
    cfg = scan2d_config(local_size_m=(4.0, 4.0, 1.6), voxel_width=0.2,
                        max_blocks=2048, raycast_mode="dda",
                        max_raycast_points=1024, data_case="cow_lady")
    world = BoxWorld.corridor(seed=6, n_pillars=3, extent=2.5)
    mapper = VolumetricMapper(cfg)
    proj = circular_trajectory(1, radius=0.5, height=0.8)[0]
    pts = world.pointcloud(proj, n_rays=1024, max_range=3.0, seed=0)
    out = mapper.process_pointcloud(proj, pts)
    assert (out.glb_type == VOX_OCCUPIED).any()
    assert (out.glb_type == VOX_FREE).any()
    occ = out.glb_type == VOX_OCCUPIED
    assert np.allclose(out.edt[occ], 0.0)
