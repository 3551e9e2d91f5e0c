"""Scaling benchmark: per-frame engine throughput vs device count.

Measurement points per BASELINE.md: 1 chip, N chips/hosts (>=70% scaling
efficiency to 2 hosts is the north star).  The canvas is sharded along x
over the mesh; the same jitted program runs at every size.

On a single-chip machine this reports the 1-device point and, when
`--virtual N` is given, a functional N-way run on virtual CPU devices
(correctness/collective-path exercise, not a hardware scaling number).

For a real multi-host pod slice: launch one process per host with
JAX coordinator env vars set and run `python bench_scaling.py --distributed`;
jax.distributed.initialize() forms the global mesh over ICI+DCN.
"""

from __future__ import annotations

# persistent XLA compilation cache: tunnel compiles cost 30-90s each
def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_enable_compile_cache()


import argparse
import json
import time

import numpy as np


def run_point(n_devices, frames, cfg_overrides, virtual_cpu=False):
    import jax

    if virtual_cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n_devices)
        except Exception:
            pass
    import jax.numpy as jnp

    from gie_mapping_tpu.map_state import MapState, canvas_geometry
    from gie_mapping_tpu.models.pipeline import merge_frame
    from gie_mapping_tpu.parallel.mesh import make_mesh, shard_state
    from gie_mapping_tpu.utils.config import cow_lady_config

    cfg = cow_lady_config(display_glb_edt=False, display_glb_ogm=False,
                          **cfg_overrides)
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    state = MapState.create(cfg)
    if mesh is not None:
        state = shard_state(state, mesh)

    rng = np.random.default_rng(0)
    inst = np.full(cfg.local_size, 1, np.int8)
    inst[rng.random(cfg.local_size) < 0.01] = 2
    pvt = np.zeros(3, np.int32)
    ob, _, off = canvas_geometry(cfg, pvt)
    M = cfg.max_ext_obs
    fence = (jnp.zeros((M, 3), jnp.float32), jnp.zeros((M, 3), jnp.float32),
             jnp.zeros((M,), jnp.bool_), jnp.int32(0))
    args = (jnp.asarray(inst), jnp.zeros(cfg.local_size, jnp.int32),
            jnp.asarray(pvt), jnp.asarray(ob), jnp.asarray(off)) + fence

    state, out = merge_frame(state, *args, cfg=cfg, input_pointcloud=False,
                             mesh=mesh)
    np.asarray(out["relax_iters"])
    t0 = time.perf_counter()
    for _ in range(frames):
        state, out = merge_frame(state, *args, cfg=cfg, input_pointcloud=False,
                                 mesh=mesh)
    np.asarray(out["relax_iters"])
    return (time.perf_counter() - t0) * 1e3 / frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--virtual", type=int, default=0,
                    help="ALSO run an N-way virtual-CPU point (functional)")
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed (multi-host pods)")
    args = ap.parse_args()

    import jax

    if args.distributed:
        jax.distributed.initialize()

    if args.virtual:
        # functional N-way run on virtual CPU devices: exercises the sharded
        # program + collectives; NOT a hardware scaling number
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.virtual)
        except Exception:
            pass

    n_avail = len(jax.devices())
    points = {}
    t1 = run_point(1, args.frames, {})
    points["1"] = round(t1, 3)
    if n_avail > 1:
        tn = run_point(n_avail, args.frames, {})
        points[str(n_avail)] = round(tn, 3)
        eff = t1 / tn / n_avail
        points["scaling_efficiency"] = round(eff, 3)
    print(json.dumps({
        "metric": "cowlady_merge_ms_per_frame_by_devices",
        "value": points.get(str(n_avail), points["1"]),
        "unit": "ms",
        "vs_baseline": round(10.0 / points.get(str(n_avail), points["1"]), 3),
        "extra": {"points_ms": points, "devices": n_avail},
    }))


if __name__ == "__main__":
    main()
