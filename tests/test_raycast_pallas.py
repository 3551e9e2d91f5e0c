"""The Pallas panorama-select kernel is bit-identical to the XLA gather."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.ops.pallas.carve import panorama_select


def _ref(depth2d, cnt2d, bt, vbp):
    vbin = bt[:, :, None] * depth2d.shape[1] + vbp
    d = depth2d.reshape(-1)[vbin]
    c = cnt2d.reshape(-1)[vbin]
    return d, c


def test_panorama_select_exact():
    rng = np.random.default_rng(3)
    NT, NP = 512, 256
    X, Y, Z = 37, 41, 30  # deliberately non-multiples of the tile sizes
    depth2d = jnp.asarray(
        np.where(rng.random((NT, NP)) < 0.7, 1e30,
                 rng.uniform(0.05, 8.0, (NT, NP))).astype(np.float32))
    cnt2d = jnp.asarray(rng.integers(0, 40, (NT, NP)).astype(np.int32))
    bt = jnp.asarray(rng.integers(0, NT, (X, Y)).astype(np.int32))
    vbp = jnp.asarray(rng.integers(0, NP, (X, Y, Z)).astype(np.int32))

    vd, vc = panorama_select(depth2d, cnt2d, bt, vbp, interpret=True)
    rd, rc = _ref(depth2d, cnt2d, bt, vbp)
    np.testing.assert_array_equal(np.asarray(vd), np.asarray(rd))
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(rc))


def test_panorama_select_small_bins():
    rng = np.random.default_rng(7)
    NT, NP = 128, 128
    X, Y, Z = 16, 16, 7
    depth2d = jnp.asarray(rng.uniform(0.05, 12.0, (NT, NP)).astype(np.float32))
    cnt2d = jnp.asarray(rng.integers(0, 10, (NT, NP)).astype(np.int32))
    bt = jnp.asarray(rng.integers(0, NT, (X, Y)).astype(np.int32))
    vbp = jnp.asarray(rng.integers(0, NP, (X, Y, Z)).astype(np.int32))

    vd, vc = panorama_select(depth2d, cnt2d, bt, vbp, interpret=True)
    rd, rc = _ref(depth2d, cnt2d, bt, vbp)
    np.testing.assert_array_equal(np.asarray(vd), np.asarray(rd))
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(rc))
