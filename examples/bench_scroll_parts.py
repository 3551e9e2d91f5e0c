"""Stage profile of the canvas scroll on the TPU (cow-lady shapes)."""
import os
import sys
import time

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
    MapState, _do_scroll, _canvas_as_blocks, _blocks_to_dense, pack_voxels,
    unpack_voxels)
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="cow_lady")
    args = ap.parse_args()

    from gie_mapping_tpu.utils.config import load_config
    cfg = load_config(args.case)
    cb = cfg.canvas_blocks
    rng = np.random.default_rng(0)
    st = MapState.create(cfg)
    occ = rng.random(cfg.canvas_size) < 0.03
    import dataclasses
    st = dataclasses.replace(
        st,
        vox_type=jnp.where(jnp.asarray(occ), 2, 1).astype(jnp.int8),
        present=jnp.asarray(rng.random(cb) < 0.9),
    )

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()

    def full(s):
        tgt = s.origin_blk.at[0].add(
            jnp.where((s.origin_blk[0] % 2) == 0, 1, -1))
        return _do_scroll(s, tgt, cfg)

    def compact(s):
        # same (rows, cols) buckets the mapper derives for a 1-block x shift
        tgt = s.origin_blk.at[0].add(
            jnp.where((s.origin_blk[0] % 2) == 0, 1, -1))
        return _do_scroll(s, tgt, cfg, compact_rows=256, compact_cols=32)

    def pack_only(s):
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        o, t, d, c = unpack_voxels(p)
        return dataclasses.replace(s, dist_sq=d + s.origin_blk[0] * 0)

    def blocks_rt(s):
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        b = _canvas_as_blocks(p, cb)
        p2 = _blocks_to_dense(b, cb)
        o, t, d, c = unpack_voxels(p2)
        return dataclasses.replace(s, dist_sq=d + s.origin_blk[0] * 0)

    def rolls(s):
        d = jnp.roll(s.dist_sq, 8, 0)
        c = jnp.roll(s.coc, 8, 0)
        o = jnp.roll(s.occ_val, 8, 0)
        t = jnp.roll(s.vox_type, 8, 0)
        return dataclasses.replace(s, dist_sq=d, coc=c, occ_val=o, vox_type=t)

    def dyn_rolls(s):
        sh = jnp.where((s.origin_blk[0] % 2) == 0, 8, -8)
        d = jnp.roll(s.dist_sq, sh, 0)
        c = jnp.roll(s.coc, sh, 0)
        o = jnp.roll(s.occ_val, sh, 0)
        t = jnp.roll(s.vox_type, sh, 0)
        return dataclasses.replace(
            s, dist_sq=d, coc=c, occ_val=o, vox_type=t,
            origin_blk=s.origin_blk.at[0].add(1))

    def dyn_rolls_3axis_packed(s):
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        sh = jnp.where((s.origin_blk[0] % 2) == 0, 8, -8)
        for ax in range(3):
            p = jnp.roll(p, -sh, axis=ax)
        o, t, d, c = unpack_voxels(p)
        return dataclasses.replace(
            s, dist_sq=d, coc=c, occ_val=o, vox_type=t,
            origin_blk=s.origin_blk.at[0].add(1))

    from gie_mapping_tpu.map_state import _arch_directory

    B = cfg.max_blocks
    nb = int(np.prod(cb))

    def dir_build(s):
        d = _arch_directory(s.arch_keys, s.n_arch + s.origin_blk[0] * 0,
                            s.origin_blk, cb)
        return dataclasses.replace(
            s, n_arch=s.n_arch + d[0, 0, 0] * 0,
            origin_blk=s.origin_blk.at[0].add(1))

    def keys_scatter(s):
        slot = (jnp.arange(nb, dtype=jnp.int32) + s.origin_blk[0]) % B
        abs_key = jnp.stack(
            [jnp.arange(nb, dtype=jnp.int32)] * 3, -1) + s.origin_blk[None, :]
        nk = s.arch_keys.at[slot].set(abs_key, mode="drop")
        return dataclasses.replace(
            s, arch_keys=nk, origin_blk=s.origin_blk.at[0].add(1))

    # finer stages of the compact scroll (round 5: the scroll step is the
    # budget-line frontier — locate where its ~4 ms actually goes)
    from gie_mapping_tpu.map_state import (_PACKED_DEFAULT, COC_INVALID16)
    from gie_mapping_tpu.ops.pallas.blockrows import (
        gather_block_rows, scatter_archive_rows, shift_canvas_pallas)

    cs = cfg.canvas_size
    X_, Y_, Z_ = cs
    L_ = 3 * Z_
    defaults = jnp.tile(jnp.asarray(_PACKED_DEFAULT, jnp.uint32),
                        Z_).reshape(1, 1, L_)

    def shift_kernel_only(s):
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        sh = jnp.where((s.origin_blk[0] % 2) == 0, 1, -1)
        shift_blk = jnp.zeros(3, jnp.int32).at[0].set(sh)
        cvv = shift_canvas_pallas(p.reshape(X_, Y_, L_), defaults, shift_blk,
                                  zshift_blk=0)
        o, t, d, c = unpack_voxels(cvv.reshape(cs + (3,)))
        return dataclasses.replace(
            s, dist_sq=d, coc=c, occ_val=o, vox_type=t,
            origin_blk=s.origin_blk.at[0].add(sh))

    def coc_reanchor_only(s):
        sv = jnp.zeros(3, jnp.int32).at[0].set(8)
        cvalid = s.coc[..., 0] != COC_INVALID16
        coc = jnp.where(cvalid[..., None],
                        (s.coc.astype(jnp.int32) - sv).astype(jnp.int16),
                        jnp.int16(COC_INVALID16))
        return dataclasses.replace(
            s, coc=coc, origin_blk=s.origin_blk.at[0].add(1))

    def archive_put_only(s):
        p = pack_voxels(s.occ_val, s.vox_type, s.dist_sq, s.coc)
        cids = jnp.arange(32, dtype=jnp.int32) + (s.origin_blk[0] % 2)
        crows = gather_block_rows(p, cids, cb)
        slots = (jnp.arange(32 * cb[2], dtype=jnp.int32) + s.origin_blk[0]
                 ) % s.a_packed.shape[0]
        ap2 = scatter_archive_rows(
            s.a_packed, crows, slots,
            jnp.ones(32 * cb[2], jnp.int32))
        return dataclasses.replace(
            s, a_packed=ap2, origin_blk=s.origin_blk.at[0].add(1))

    for name, fn in [
        ("full scroll", full),
        ("directory build", dir_build),
        ("arch_keys full-canvas-row scatter", keys_scatter),
        ("dynamic rolls x4 arrays", dyn_rolls),
        ("packed 3-axis dynamic roll", dyn_rolls_3axis_packed),
        ("compact scroll (256/32)", compact),
        ("pack + shift kernel + unpack", shift_kernel_only),
        ("coc re-anchor passes", coc_reanchor_only),
        ("archive put (gather+row scatter)", archive_put_only),
        ("pack+unpack only", pack_only),
        ("pack+block roundtrip", blocks_rt),
        ("4 dense rolls", rolls),
    ]:
        print(f"{name}: {timed(fn, st):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
