"""Interpret-mode checks for the scroll block-row Pallas kernels.

Contract: gather_block_rows / scatter_block_rows are bit-identical to the XLA
dense<->block-major formulation in map_state._do_scroll's compact path.
"""
import numpy as np
import jax.numpy as jnp

from gie_mapping_tpu.map_state import _dense_to_blocks, _blocks_to_dense
from gie_mapping_tpu.ops.pallas.blockrows import (
    gather_block_rows, scatter_block_rows)

CB = (4, 3, 2)          # canvas blocks
CS = tuple(8 * b for b in CB)
NB = CB[0] * CB[1] * CB[2]
CBZ = CB[2]


def _rand_canvas(rng):
    return rng.integers(0, 2 ** 32, CS + (3,), dtype=np.uint32)


def test_gather_block_rows_exact():
    rng = np.random.default_rng(3)
    packed = _rand_canvas(rng)
    cols = np.array([0, 5, 11, 7, 7, 0], np.int32)  # repeats allowed

    all_rows = np.asarray(
        _dense_to_blocks(jnp.asarray(packed), CB)).reshape(NB, 512, 3)
    bidx = (cols[:, None] * CBZ + np.arange(CBZ)).reshape(-1)
    want = all_rows[bidx]
    got = gather_block_rows(jnp.asarray(packed), jnp.asarray(cols), CB,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_scatter_block_rows_exact():
    rng = np.random.default_rng(4)
    packed = _rand_canvas(rng)
    B = 10
    a_packed = rng.integers(0, 2 ** 32, (B, 512, 3), dtype=np.uint32)

    # columns 3, 10 valid; column entries parked at col 1 invalid.
    # within column 3 only z-block 1 is written; column 10 writes both.
    cols = np.array([3, 10, 1, 1], np.int32)
    slot = np.array([[0, 9], [4, 7], [0, 0], [2, 0]], np.int32)
    valid = np.array([[0, 1], [1, 1], [0, 0], [0, 0]], np.int32)

    blocks = np.asarray(_dense_to_blocks(jnp.asarray(packed), CB)).reshape(
        NB, 512, 3).copy()
    blocks[3 * CBZ + 1] = a_packed[9]
    blocks[10 * CBZ + 0] = a_packed[4]
    blocks[10 * CBZ + 1] = a_packed[7]
    want = np.asarray(_blocks_to_dense(
        jnp.asarray(blocks.reshape(CB + (8, 8, 8, 3))), CB))

    rows = a_packed[slot.reshape(-1)]
    got = scatter_block_rows(
        jnp.asarray(packed), jnp.asarray(rows), jnp.asarray(cols),
        jnp.asarray(valid.reshape(-1)), CB, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_scatter_all_invalid_is_identity():
    rng = np.random.default_rng(5)
    packed = _rand_canvas(rng)
    a_packed = rng.integers(0, 2 ** 32, (4, 512, 3), dtype=np.uint32)
    S = 5
    rows = np.broadcast_to(a_packed[0], (S * CBZ, 512, 3)).copy()
    got = scatter_block_rows(
        jnp.asarray(packed), jnp.asarray(rows),
        jnp.zeros(S, jnp.int32), jnp.zeros(S * CBZ, jnp.int32), CB,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), packed)


def test_gather_archive_rows_exact():
    from gie_mapping_tpu.ops.pallas.blockrows import gather_archive_rows

    rng = np.random.default_rng(7)
    B = 17
    a_packed = rng.integers(0, 2 ** 32, (B, 1536), dtype=np.uint32)
    ids = np.array([3, 0, 16, 7, 7, 0], np.int32)
    got = gather_archive_rows(jnp.asarray(a_packed), jnp.asarray(ids),
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  a_packed[ids].reshape(-1, 512, 3))


def test_scatter_archive_rows_exact():
    from gie_mapping_tpu.ops.pallas.blockrows import scatter_archive_rows

    rng = np.random.default_rng(8)
    B, K = 13, 6
    a_packed = rng.integers(0, 2 ** 32, (B, 1536), dtype=np.uint32)
    rows = rng.integers(0, 2 ** 32, (K, 512, 3), dtype=np.uint32)
    # parked entries interleaved in ANY order — park at row 4, which a
    # valid entry also overwrites (the hard case; the kernel sorts
    # invalid-first internally)
    ids = np.array([9, 4, 4, 4, 0, 12], np.int32)
    valid = np.array([1, 0, 0, 1, 1, 1], np.int32)

    want = a_packed.copy()
    for k in range(K):
        if valid[k]:
            want[ids[k]] = rows[k].reshape(-1)
    got = scatter_archive_rows(jnp.asarray(a_packed), jnp.asarray(rows),
                               jnp.asarray(ids), jnp.asarray(valid),
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)
