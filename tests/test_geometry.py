import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.utils import geometry as geo


def test_pos2coord_roundtrip():
    p = jnp.asarray([[0.0, 0.05, -0.05], [1.04, -1.04, 2.51]], jnp.float32)
    c = geo.pos2coord(p, 0.1)
    np.testing.assert_array_equal(np.asarray(c), [[0, 1, 0], [10, -10, 25]])
    back = geo.coord2pos(c, 0.1)
    assert np.abs(np.asarray(back) - np.asarray(p)).max() <= 0.05 + 1e-6


def test_projection_roundtrip():
    proj = geo.Projection.from_pose([1.0, 2.0, 3.0], [0.9238795, 0.0, 0.0, 0.3826834])
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)), jnp.float32)
    rt = proj.g2l(proj.l2g(pts))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(pts), atol=1e-5)


def test_block_key_negative():
    c = jnp.asarray([[-1, -8, -9], [0, 7, 8]], jnp.int32)
    np.testing.assert_array_equal(np.asarray(geo.block_key_of(c)), [[-1, -1, -2], [0, 0, 1]])
    np.testing.assert_array_equal(np.asarray(geo.sub_block_index(c)), [[7, 0, 7], [0, 7, 0]])


def test_pivot_centering():
    pvt = geo.calculate_pivot([0.0, 0.0, 0.0], 0.1, (100, 100, 30))
    np.testing.assert_array_equal(pvt, [-50, -50, -15])


def test_squared_dist():
    a = jnp.asarray([1, 2, 3], jnp.int32)
    b = jnp.asarray([4, 0, 3], jnp.int32)
    assert int(geo.squared_dist(a, b)) == 13
