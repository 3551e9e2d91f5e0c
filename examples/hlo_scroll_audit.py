"""Compiler-measured HBM traffic of the canvas scroll — throttle-proof.

The compacted scroll's remaining full-canvas term is the pack -> roll ->
entering-scatter -> unpack chain over the packed voxel payload
(map_state._do_scroll).  In principle XLA can fuse the pack into the roll's
read and the unpack into its consumers, leaving ~2x12 B/voxel; if it cannot
(the entering-row scatter between roll and unpack is a fusion barrier), the
chain pays up to 72 B/voxel and a per-field roll (24 B/voxel, no pack) would
halve the scroll's full-canvas traffic.

This audit reads what XLA ACTUALLY does: cost_analysis "bytes accessed" of

  a) the real jitted scroll program (map_state._do_scroll, compact path),
  b) a pack->roll->unpack chain alone (no archive I/O),
  c) a per-field roll of the four canvases (the rework candidate),

per canvas class.  Run on the real TPU: python examples/hlo_scroll_audit.py
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cc():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_cc()

import jax
import jax.numpy as jnp
import numpy as np

from gie_mapping_tpu.map_state import (MapState, _do_scroll, pack_voxels,
                                       unpack_voxels, _PACKED_DEFAULT)
from gie_mapping_tpu.utils.config import load_config

CASES = ["cow_lady", "depthcam", "ugv_corridor"]


def _bytes(c):
    d = c.cost_analysis()
    if isinstance(d, (list, tuple)):
        d = d[0]
    return float(d.get("bytes accessed", float("nan")))


def _shift_nd(arr, fill, shifts, sizes):
    out = arr
    for ax in range(3):
        out = jnp.roll(out, -shifts[ax], axis=ax)
    exposed = jnp.zeros(sizes, jnp.bool_)
    for ax in range(3):
        idx = jax.lax.broadcasted_iota(jnp.int32, sizes, ax)
        src = idx + shifts[ax]
        exposed |= (src < 0) | (src >= sizes[ax])
    mask = exposed[(...,) + (None,) * (arr.ndim - 3)]
    return jnp.where(mask, jnp.asarray(fill, arr.dtype), out)


def audit_case(case):
    cfg = load_config(case)
    cs = cfg.canvas_size
    vox = int(np.prod(cs))
    st = MapState.create(cfg)
    shift = jnp.asarray([1, 0, 0], jnp.int32)  # one block column in x

    # a) the real compact scroll program
    def real(s, origin):
        return _do_scroll(s, origin, cfg, compact_rows=1024, compact_cols=64)

    ca = jax.jit(real).lower(st, st.origin_blk + shift).compile()

    # b) pack -> roll -> unpack alone (the full-canvas portion, no archive)
    def chain(o, t, d, c, sv):
        p = pack_voxels(o, t, d, c)
        p = _shift_nd(p, jnp.asarray(_PACKED_DEFAULT), sv, cs)
        return unpack_voxels(p)

    cb = jax.jit(chain).lower(st.occ_val, st.vox_type, st.dist_sq, st.coc,
                              shift * 8).compile()

    # c) per-field roll (rework candidate; coc re-anchor fused in)
    def perfield(o, t, d, c, sv):
        o2 = _shift_nd(o, 0, sv, cs)
        t2 = _shift_nd(t, -1, sv, cs)
        d2 = _shift_nd(d, 999999, sv, cs)
        c2 = _shift_nd(c, 32767, sv, cs)
        valid = c2[..., 0] != 32767
        c2 = jnp.where(valid[..., None],
                       (c2.astype(jnp.int32) - sv).astype(jnp.int16),
                       jnp.int16(32767))
        return o2, t2, d2, c2

    cc = jax.jit(perfield).lower(st.occ_val, st.vox_type, st.dist_sq, st.coc,
                                 shift * 8).compile()

    return {
        "case": case, "canvas_mvox": round(vox / 1e6, 2),
        "scroll_program_mb": round(_bytes(ca) / 1e6, 1),
        "pack_roll_unpack_mb": round(_bytes(cb) / 1e6, 1),
        "per_field_roll_mb": round(_bytes(cc) / 1e6, 1),
        "bytes_per_vox": {
            "scroll_program": round(_bytes(ca) / vox, 1),
            "pack_roll_unpack": round(_bytes(cb) / vox, 1),
            "per_field_roll": round(_bytes(cc) / vox, 1),
        },
    }


def main():
    backend = jax.default_backend()
    print("backend:", backend, file=sys.stderr)
    assert backend in ("tpu", "axon"), "audit requires the TPU backend"
    for case in CASES:
        print(json.dumps(audit_case(case)), flush=True)


if __name__ == "__main__":
    main()
