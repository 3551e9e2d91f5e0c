"""Compiler-measured HBM traffic of the FULL frame program, old vs new
defaults — the frame-level impact of the round-2 allin default flip
(companion to hlo_traffic_audit.py, which audits batch_edt alone)."""
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
# both chains spelled out explicitly so the audit still measures the flip
# even if MapConfig defaults are ever reverted
CHAINS = {"old_default": dict(edt_phase1="xla", edt_mid=False),
          "allin (new default)": dict(edt_phase1="pallas", edt_mid=True)}


def audit(cfg):
    gmap = MapState.create(cfg)
    args = (gmap,) + ge._frame_inputs(cfg)
    fn = functools.partial(merge_frame_impl, cfg=cfg, input_pointcloud=False)
    c = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile()
    d = c.cost_analysis()
    if isinstance(d, (list, tuple)):
        d = d[0]
    return float(d.get("bytes accessed", float("nan")))


def main():
    backend = jax.default_backend()
    print("backend:", backend, file=sys.stderr)
    assert backend in ("tpu", "axon"), (
        f"audit requires the TPU backend (got {backend}); the chains compile "
        "identically under the CPU fallback")
    for name, mk in CASES:
        row, base = {}, None
        for cname, over in CHAINS.items():
            b = audit(mk(**over))
            if base is None:
                base = b
            row[cname] = {"mb": round(b / 1e6, 1),
                          "vs_old": round(b / base, 3)}
        print(json.dumps({"case": name, "frame_bytes_accessed": row}),
              flush=True)


if __name__ == "__main__":
    main()
