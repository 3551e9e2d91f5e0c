"""Packed voxel payload: exact roundtrip across the full value ranges."""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.map_state import pack_voxels, unpack_voxels, _PACKED_DEFAULT
from gie_mapping_tpu.utils.constants import EMPTY_VALUE


def test_pack_roundtrip(rng):
    n = 4096
    occ = jnp.asarray(rng.integers(0, 256, n).astype(np.uint8))
    typ = jnp.asarray(rng.integers(0, 4, n).astype(np.int8))
    dist = jnp.asarray(rng.integers(0, EMPTY_VALUE + 1, n).astype(np.int32))
    coc = jnp.asarray(rng.integers(-32768, 32768, (n, 3)).astype(np.int16))
    o, t, d, c = unpack_voxels(pack_voxels(occ, typ, dist, coc))
    np.testing.assert_array_equal(np.asarray(o), np.asarray(occ))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(typ))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(dist))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(coc))


def test_packed_default_is_unseen():
    o, t, d, c = unpack_voxels(jnp.asarray(_PACKED_DEFAULT))
    assert int(d) == EMPTY_VALUE
    assert int(t) == 0 and int(o) == 0
    assert (np.asarray(c) == 32767).all()
