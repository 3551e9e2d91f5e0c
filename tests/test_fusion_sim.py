"""Long-horizon fuzz: the engine's occupancy memory (fusion + scrolling +
archive round trips) must exactly match a reference dict-based simulator of
the fusion rules over random trajectories with teleports and revisits."""
import numpy as np
import pytest
import jax.numpy as jnp

from gie_mapping_tpu.map_state import MapState, canvas_geometry
from gie_mapping_tpu.models.pipeline import merge_frame, scroll_step
from gie_mapping_tpu.utils.config import scan2d_config
from gie_mapping_tpu.utils.constants import (
    VOX_FNT,
    VOX_FREE,
    VOX_OCCUPIED,
    VOX_UNKNOWN,
)


class DictSim:
    """Reference semantics of the occupancy layer (set_hashvoxel_occ_val,
    voxmap_utils.cuh:181-200 + sensor fusion, unify_helper.cuh:118-197)."""

    def __init__(self, thresh=180):
        self.occ = {}  # glb voxel -> (occ_val uint8, type)
        self.thresh = thresh

    def fuse(self, glb, inst):
        old_occ, old_type = self.occ.get(glb, (0, VOX_UNKNOWN))
        if inst == VOX_OCCUPIED:
            val, alpha = 250.0, 0.8
        elif inst == VOX_FREE:
            val, alpha = 0.0, 0.5
        else:
            return
        prev = float(old_occ) if old_type != VOX_UNKNOWN else 0.0
        new = alpha * val + (1 - alpha) * prev
        new = min(max(new, 1.0), 254.0)
        new_u8 = int(np.uint8(np.float32(new)))
        typ = VOX_OCCUPIED if new_u8 > self.thresh else VOX_FREE
        self.occ[glb] = (new_u8, typ)


def _fence(cfg):
    M = cfg.max_ext_obs
    return (jnp.zeros((M, 3), jnp.float32), jnp.zeros((M, 3), jnp.float32),
            jnp.zeros((M,), jnp.bool_), jnp.int32(0))


def _fuzz_horizon(n_frames, teleports, seed=123, stride=3, check_every=1):
    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        fast_mode=True, cutoff_dist=2.0, max_blocks=4096,
                        for_motion_planner=False)
    X, Y, Z = cfg.local_size
    rng = np.random.default_rng(seed)
    state = MapState.create(cfg)
    sim = DictSim(cfg.occupancy_threshold)
    origin_host = None

    pivots = []
    p = np.zeros(3, int)
    for i in range(n_frames):
        if i in teleports:  # teleport far away and back
            p = (np.asarray([60, -40, 0]) if len(pivots) % 2 == 0
                 else np.zeros(3, int))
        else:
            p = p + rng.integers(-3, 4, 3) * np.asarray([1, 1, 0])
        pivots.append(p.copy())

    for i, pvt in enumerate(pivots):
        inst = np.full(cfg.local_size, VOX_UNKNOWN, np.int8)
        # random partial observation
        mask = rng.random(cfg.local_size) < 0.4
        inst[mask & (rng.random(cfg.local_size) < 0.15)] = VOX_OCCUPIED
        inst[mask & (inst == VOX_UNKNOWN) & (rng.random(cfg.local_size) < 0.5)] = VOX_FREE

        origin_blk, _, off = canvas_geometry(cfg, pvt)
        if origin_host is None or not np.array_equal(origin_host, origin_blk):
            state = scroll_step(state, jnp.asarray(origin_blk), cfg=cfg)
            origin_host = origin_blk
        state, out = merge_frame(
            state, jnp.asarray(inst), jnp.zeros(cfg.local_size, jnp.int32),
            jnp.asarray(pvt.astype(np.int32)), jnp.asarray(origin_blk),
            jnp.asarray(off), *_fence(cfg), cfg=cfg, input_pointcloud=False,
            do_scroll=False,
        )

        # simulator applies the same observations
        for idx in np.argwhere(inst != VOX_UNKNOWN):
            sim.fuse(tuple(idx + pvt), int(inst[tuple(idx)]))

        if (i + 1) % check_every and i != len(pivots) - 1:
            continue
        # compare the window occupancy state (strided for speed)
        got = np.asarray(out["glb_type"])
        for xi in range(0, X, stride):
            for yi in range(0, Y, stride):
                for zi in range(Z):
                    glb = (xi + pvt[0], yi + pvt[1], zi + pvt[2])
                    _, want_type = sim.occ.get(glb, (0, VOX_UNKNOWN))
                    g = got[xi, yi, zi]
                    if g == VOX_FNT:
                        g = VOX_FREE  # FNT marks a FREE voxel
                    assert g == want_type, (i, glb, g, want_type)


def test_fusion_memory_fuzz():
    _fuzz_horizon(14, teleports=(5, 10))


def test_fusion_memory_soak():
    """Soak extension (VERDICT r2 item 5): 100 frames of continuous random
    scroll with four teleports; the dict simulator stays exactly equal."""
    _fuzz_horizon(100, teleports=(25, 50, 75, 90), seed=321, stride=4,
                  check_every=10)
