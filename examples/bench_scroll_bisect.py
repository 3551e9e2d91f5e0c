"""Bisect the scroll cost: which composition step is the multi-ms one?

Each case keeps a real data dependency through the scan carry so nothing is
DCE'd or hoisted, and ends in the state so the identity-simplifier cannot
cancel round trips.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cc():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_cc()

import numpy as np
import jax
import jax.numpy as jnp

from gie_mapping_tpu.map_state import (
    MapState, _canvas_as_blocks, _blocks_to_dense, pack_voxels, unpack_voxels,
    VB_SIZE_)
from gie_mapping_tpu.utils.config import cow_lady_config

K = 6
_LAT = [0.0]


def link_latency():
    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    return min(lat)


def timed(step, carry):
    @jax.jit
    def chain(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=K)
        return jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.float32(y.reshape(-1)[0].astype(jnp.float32)),
            c, jnp.float32(0))

    np.asarray(chain(carry))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(carry))
        best = min(best, time.perf_counter() - t0)
    return (best - _LAT[0]) / K * 1e3


def main():
    cfg = cow_lady_config()
    cb = cfg.canvas_blocks
    nb = int(np.prod(cb))
    B = cfg.max_blocks
    rng = np.random.default_rng(0)
    st = MapState.create(cfg)
    st = dataclasses.replace(
        st,
        vox_type=jnp.asarray(
            np.where(rng.random(cfg.canvas_size) < 0.03, 2, 1).astype(np.int8)),
        present=jnp.asarray(rng.random(cb) < 0.9),
    )

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()

    def to_blocks_only(s):
        """pack -> blocks -> row reduce back into the state (not invertible,
        so the transpose must actually run)."""
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        rows = _canvas_as_blocks(p, cb).reshape(nb, VB_SIZE_, 3)
        v = rows[:, 0, 0].reshape(cb).astype(jnp.int32)
        return dataclasses.replace(
            s, dist_sq=s.dist_sq.at[0, 0, 0].add(v[0, 0, 0] % 2))

    def from_blocks_only(s):
        """archive rows -> blocks -> dense -> state write."""
        rows = s.a_packed[:nb]
        p = _blocks_to_dense(
            rows.reshape(cb + (8, 8, 8, 3)), cb)
        _, _, d, _ = unpack_voxels(p)
        return dataclasses.replace(
            s, dist_sq=d + s.dist_sq[0, 0, 0] % 2)

    def roundtrip_via_archive(s):
        """pack -> blocks -> 3610-row scatter to archive -> gather ->
        dense -> unpack: the scroll's full archive data path."""
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        rows = _canvas_as_blocks(p, cb).reshape(nb, VB_SIZE_, 3)
        slot = (jnp.arange(nb, dtype=jnp.int32) + s.origin_blk[0]) % B
        ap = s.a_packed.at[slot].set(rows, mode="drop")
        back = ap[slot]
        p2 = _blocks_to_dense(back.reshape(cb + (8, 8, 8, 3)), cb)
        o, t, d, c = unpack_voxels(p2)
        return dataclasses.replace(
            s, a_packed=ap, dist_sq=d, coc=c, occ_val=o, vox_type=t,
            origin_blk=s.origin_blk.at[0].add(1))

    def keys_scatter(s):
        slot = (jnp.arange(nb, dtype=jnp.int32) + s.origin_blk[0]) % B
        abs_key = jnp.stack(
            [jnp.arange(nb, dtype=jnp.int32)] * 3, -1) + s.origin_blk[None, :]
        nk = s.arch_keys.at[slot].set(abs_key, mode="drop")
        return dataclasses.replace(
            s, arch_keys=nk, origin_blk=s.origin_blk.at[0].add(1))

    def dir_build(s):
        from gie_mapping_tpu.map_state import _arch_directory
        d = _arch_directory(s.arch_keys, s.n_arch + s.origin_blk[0] * 0,
                            s.origin_blk, cb)
        return dataclasses.replace(
            s, n_arch=s.n_arch + d[0, 0, 0] * 0,
            origin_blk=s.origin_blk.at[0].add(1))

    for name, fn in [
        ("pack->blocks (one way)", to_blocks_only),
        ("blocks->dense (one way)", from_blocks_only),
        ("archive roundtrip (full data path)", roundtrip_via_archive),
        ("arch_keys 3610-row scatter", keys_scatter),
        ("directory build", dir_build),
    ]:
        print(f"{name}: {timed(fn, st):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
