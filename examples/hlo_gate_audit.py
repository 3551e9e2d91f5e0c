"""Compiler-measured HBM traffic of the change-gated EDT — throttle-proof.

Companion to hlo_traffic_audit.py for the round-3 gate: `cost_analysis()`
"bytes accessed" of batch_edt_slab at each _slab_menu size vs the full
batch_edt (allin chain), per canvas class.  Frame-level audits of the gated
switch would sum ALL branches (lax.switch; see ROADMAP round-2 caveat), so
the slab transform — the term the gate actually shrinks — is audited
directly; the merge's slab-sized selects scale the same way by construction
(dynamic_update_slice on donated buffers).

Also reports compiled.memory_analysis() of the FULL gated frame program vs
ungated, verifying donation/aliasing still engages through the switch (no
state double-copy) and temp memory stays sane.

Run on the real TPU: python examples/hlo_gate_audit.py
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

from gie_mapping_tpu.models.pipeline import _slab_menu
from gie_mapping_tpu.ops.edt_batch import batch_edt, batch_edt_slab

CASES = [
    ("cow_lady", (152, 152, 80)),
    ("depthcam", (232, 232, 160)),
    ("ugv_corridor", (232, 232, 56)),
]
ALLIN = dict(env_variant="fusepay", p1="pallas", mid=True)


def _bytes(c):
    d = c.cost_analysis()
    if isinstance(d, (list, tuple)):
        d = d[0]
    return float(d.get("bytes accessed", float("nan")))


def audit_slab(shape):
    occ = jnp.zeros(shape, jnp.int8)
    mw = sum(shape)

    def run_full(g):
        r = batch_edt(g, max_width=mw, **ALLIN)
        return r["dist_sq"], r["coc"], r["valid"]

    base = _bytes(jax.jit(run_full).lower(occ).compile())
    row = {"full_mb": round(base / 1e6, 1)}
    for k, (sx, sy) in enumerate(_slab_menu(shape)):
        def run_slab(g, sx=sx, sy=sy):
            r = batch_edt_slab(g, jnp.int32(0), jnp.int32(0), sx=sx, sy=sy,
                               max_width=mw, **ALLIN)
            return r["dist_sq"], r["coc"], r["valid"]

        b = _bytes(jax.jit(run_slab).lower(occ).compile())
        row[f"slab{k}_{sx}x{sy}"] = {"mb": round(b / 1e6, 1),
                                     "vs_full": round(b / base, 3)}
    return row


def audit_frame_memory(mk):
    import __graft_entry__ as ge
    from gie_mapping_tpu.map_state import MapState
    from gie_mapping_tpu.models.pipeline import merge_frame_impl

    out = {}
    for gate in (False, True):
        cfg = mk(edt_gate=gate)
        gmap = MapState.create(cfg)
        args = (gmap,) + ge._frame_inputs(cfg)
        fn = functools.partial(merge_frame_impl, cfg=cfg,
                               input_pointcloud=False)
        c = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile()
        m = c.memory_analysis()
        out["gated" if gate else "ungated"] = {
            "arg_mb": round(m.argument_size_in_bytes / 1e6, 1),
            "out_mb": round(m.output_size_in_bytes / 1e6, 1),
            "alias_mb": round(m.alias_size_in_bytes / 1e6, 1),
            "temp_mb": round(m.temp_size_in_bytes / 1e6, 1),
        }
    return out


def audit_arm_bytes(mk, arms):
    """Frame-level cost_analysis bytes across gate-config arms.

    lax.switch makes the ABSOLUTE number an all-branches sum (ROADMAP
    round-2 caveat) — but every arm compiles the identical branch
    structure, so pairwise DELTAS isolate what each knob removes (block:
    the full-canvas dist_sq P read; p1c: the full-canvas phase-1 rescan,
    minus the per-branch patch/full-p1 switch the sum re-adds)."""
    import __graft_entry__ as ge
    from gie_mapping_tpu.map_state import MapState
    from gie_mapping_tpu.models.pipeline import merge_frame_impl

    out = {}
    for label, ovr in arms.items():
        cfg = mk(edt_gate=True, **ovr)
        gmap = MapState.create(cfg)
        args = (gmap,) + ge._frame_inputs(cfg)
        fn = functools.partial(merge_frame_impl, cfg=cfg,
                               input_pointcloud=False)
        c = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile()
        m = c.memory_analysis()
        out[label] = {"bytes_mb": round(_bytes(c) / 1e6, 1),
                      "temp_mb": round(m.temp_size_in_bytes / 1e6, 1),
                      "alias_mb": round(m.alias_size_in_bytes / 1e6, 1)}
    labels = list(arms)
    for a, b in zip(labels, labels[1:]):
        out[f"{b}_minus_{a}_mb"] = round(
            out[b]["bytes_mb"] - out[a]["bytes_mb"], 1)
    return out


def main():
    backend = jax.default_backend()
    print("backend:", backend, file=sys.stderr)
    assert backend in ("tpu", "axon"), "audit requires the TPU backend"
    for name, shape in CASES:
        print(json.dumps({"case": name, "slab_bytes": audit_slab(shape)}),
              flush=True)

    from gie_mapping_tpu.utils.config import cow_lady_config, load_config

    print(json.dumps({"case": "cow_lady",
                      "frame_memory": audit_frame_memory(cow_lady_config)}),
          flush=True)
    arms = {"voxel": dict(edt_gate_pmode="voxel"),
            "block": dict(edt_gate_pmode="block"),
            "block_p1c": dict(edt_gate_pmode="block", edt_p1_cache=True)}
    for case in ("cow_lady", "depthcam", "ugv_corridor"):
        mk = functools.partial(load_config, case)
        print(json.dumps({"case": case,
                          "pmode_frame_bytes": audit_arm_bytes(mk, arms)}),
              flush=True)


if __name__ == "__main__":
    main()
