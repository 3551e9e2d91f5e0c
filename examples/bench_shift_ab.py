"""Interleaved on-device A/B: Pallas canvas-shift kernel vs the XLA rolls.

The scroll's dense roll + exposed-fill is ONE Pallas pass
(ops/pallas/blockrows.shift_canvas_pallas: x/y displacement in the
scalar-prefetched index_map, z as a static lane rotation) vs the XLA
formulation's one-materialisation-per-axis (~282 B/voxel with the
pack/unpack chain, examples/hlo_scroll_audit.py).  K scrolls chain in one
scan program per pass, so the per-program throttle quantum amortises and
the inner per-scroll delta is real even in throttled windows
(bench_artifacts/throttle_quantum_*.jsonl).

First capture (2026-08-20, ~3x-throttled): cow 3.53 -> 2.60 ms/scroll
(1.36x), depthcam 6.25 -> 5.40 (1.16x).

Usage: python examples/bench_shift_ab.py [--cases cow_lady,depthcam]
"""
import argparse
import dataclasses
import json
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

K = 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="cow_lady,depthcam,ugv_corridor")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _wait_for_backend

    _wait_for_backend()

    import jax
    import jax.numpy as jnp

    from gie_mapping_tpu.map_state import MapState, _do_scroll
    from gie_mapping_tpu.utils.config import load_config

    probe = jax.jit(lambda i: i + 1)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = int(probe(jnp.int32(i)))
        lat.append(time.perf_counter() - t0)
    link = float(np.median(lat))

    for case in args.cases.split(","):
        cfg = load_config(case)
        rng = np.random.default_rng(0)
        st = MapState.create(cfg)
        st = dataclasses.replace(
            st,
            vox_type=jnp.asarray(
                np.where(rng.random(cfg.canvas_size) < 0.03, 2, 1)
                .astype(np.int8)),
            present=jnp.asarray(rng.random(cfg.canvas_blocks) < 0.9))

        def mk(shift_pallas):
            @jax.jit
            def chain(s):
                def body(s, i):
                    delta = jnp.where(i % 2 == 0, 1, -1)  # +x/-x: no drift
                    org = s.origin_blk.at[0].add(delta)
                    s = _do_scroll(s, org, cfg, compact_rows=1024,
                                   compact_cols=64,
                                   shift_pallas=shift_pallas)
                    return s, ()
                s, _ = jax.lax.scan(body, s, jnp.arange(K), length=K)
                return s
            return chain

        fns = {v: mk(v) for v in (False, True)}
        for fn in fns.values():
            np.asarray(fn(st).origin_blk)  # compile + warm
        res = {False: [], True: []}
        for _rep in range(args.reps):
            for v, fn in fns.items():
                t0 = time.perf_counter()
                np.asarray(fn(st).origin_blk)
                res[v].append((time.perf_counter() - t0 - link) / K * 1e3)
        a, b = min(res[False]), min(res[True])
        print(json.dumps({
            "metric": f"{case}_scroll_shift_ab_ms_per_scroll",
            "xla": round(a, 3), "pallas": round(b, 3),
            "speedup": round(a / max(b, 1e-9), 3),
            "passes_xla": [round(x, 2) for x in res[False]],
            "passes_pallas": [round(x, 2) for x in res[True]],
            "link_ms": round(link * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
