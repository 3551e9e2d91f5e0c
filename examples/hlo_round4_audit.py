"""Compiler-measured HBM traffic of the frame program, round-3 vs round-4
configurations (throttle-independent evidence for the round-4 flips;
companion to hlo_frame_audit.py / hlo_gate_audit.py).

Arms (all gate ON, canvas_edt):
  r3_gate        round-3 defaults: pmode=voxel, no phase-1 cache
  r4_stack       round-4 defaults: pmode=block + p1 cache
  r4_stack_light r4_stack with emit_outputs=False (the replay scan's
                 non-final frames)

cost_analysis counts both switch/cond branches and no fusion reuse, so only
SAME-STRUCTURE ratios are evidence (docs/ROADMAP.md round-2 caveat); the
switch shape is identical across arms here.
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

import __graft_entry__ as ge
from gie_mapping_tpu.map_state import MapState
from gie_mapping_tpu.models.pipeline import merge_frame_impl
from gie_mapping_tpu.utils.config import (cow_lady_config, depthcam_config,
                                          ugv_corridor_config)

CASES = [("cow_lady", cow_lady_config), ("depthcam", depthcam_config),
         ("ugv_corridor", ugv_corridor_config)]
ARMS = {
    "r3_gate": (dict(edt_gate_pmode="voxel", edt_p1_cache=False), True),
    "r4_stack": (dict(edt_gate_pmode="block", edt_p1_cache=True), True),
    "r4_stack_light": (dict(edt_gate_pmode="block", edt_p1_cache=True), False),
}


def audit(cfg, emit):
    gmap = MapState.create(cfg)
    args = (gmap,) + ge._frame_inputs(cfg)
    fn = functools.partial(merge_frame_impl, cfg=cfg, input_pointcloud=False,
                           emit_outputs=emit)
    c = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile()
    d = c.cost_analysis()
    if isinstance(d, (list, tuple)):
        d = d[0]
    return float(d.get("bytes accessed", float("nan")))


def main():
    backend = jax.default_backend()
    print("backend:", backend, file=sys.stderr)
    assert backend in ("tpu", "axon"), (
        f"audit requires the TPU backend (got {backend})")
    for name, mk in CASES:
        row, base = {}, None
        for aname, (over, emit) in ARMS.items():
            b = audit(mk(**over), emit)
            if base is None:
                base = b
            row[aname] = {"mb": round(b / 1e6, 1),
                          "vs_r3": round(b / base, 3)}
        print(json.dumps({"case": name, "frame_bytes_accessed": row}),
              flush=True)


if __name__ == "__main__":
    main()
