"""The analytic ray marcher must agree EXACTLY with the dense-sampling
oracle on the fixture worlds (same sample grid, same inclusive/strict
boundary semantics) — the goldens regenerate their sensor data through it,
so any drift here is a silent fixture change."""
import numpy as np

from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory


def test_ray_march_matches_dense_oracle():
    for seed, n_pillars, extent, height in [(42, 5, 4.0, 3.0),
                                            (11, 8, 4.0, 2.5),
                                            (3, 5, 3.0, 2.0)]:
        world = BoxWorld.corridor(seed=seed, n_pillars=n_pillars,
                                  extent=extent, height=height)
        for i, p in enumerate(circular_trajectory(4, radius=1.2, height=0.7)):
            rng = np.random.default_rng(100 + i)
            v = rng.normal(size=(2048, 3)).astype(np.float32)
            v /= np.linalg.norm(v, axis=-1, keepdims=True)
            d = v @ np.asarray(p.rot).T
            a = world.ray_march(np.asarray(p.trans), d, 8.0)
            b = world.ray_march_dense(np.asarray(p.trans), d, 8.0)
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
            assert eq.all(), f"seed {seed} frame {i}: {(~eq).sum()} rays"


def test_ray_march_outside_world_start():
    """Rays starting OUTSIDE the bounding walls hit at the first sample
    (dense marching sees 'outside' immediately)."""
    world = BoxWorld.corridor(seed=1, n_pillars=2, extent=2.0, height=2.0)
    o = np.asarray([10.0, 0.0, 1.0], np.float32)  # beyond +x wall
    d = np.asarray([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    a = world.ray_march(o, d, 8.0)
    b = world.ray_march_dense(o, d, 8.0)
    eq = (a == b) | (np.isnan(a) & np.isnan(b))
    assert eq.all(), (a, b)
