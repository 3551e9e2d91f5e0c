"""Characterise the tunnel throttle's quantum (round 3).

Round-2 probes established that in throttled windows run time is largely
independent of bytes AND pass count (docs/PERF.md §1, ROADMAP kernel-
efficiency findings).  The remaining question: is the cost per PROGRAM
(dispatch), per scan ITERATION, or per wall-time quantum?  This times, in
one run (same window):

  copy_k   — ONE program containing a lax.scan of k dependent HBM copies
             (cow-canvas-sized int32), k in {1, 4, 16}
  edt_k    — same with k chained batch_edt iterations

If time grows ~linearly with k, the throttle gates inner iterations (or is
genuinely bandwidth-like); if ~flat, the quantum is per-program and replay
chunk size is THE lever for throttled-window frame rates.

Times via K dispatches of the same program + one readback (bench
methodology).  Run while THROTTLED to learn anything.
"""
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


def main():
    from bench import _wait_for_backend

    _wait_for_backend()

    import jax
    import jax.numpy as jnp

    from gie_mapping_tpu.ops.edt_batch import batch_edt

    shape = (152, 152, 80)
    mw = sum(shape)
    rng = np.random.default_rng(0)
    occ = np.zeros(shape, np.int8)
    n = int(0.03 * shape[0] * shape[1] * 25)
    occ[rng.integers(0, shape[0], n), rng.integers(0, shape[1], n),
        rng.integers(20, 45, n)] = 2
    glb = jnp.asarray(occ)
    buf = jnp.asarray(rng.integers(0, 1 << 20, shape).astype(np.int32))

    def make_copy(k):
        @jax.jit
        def f(x):
            def body(x, _):
                return x + 1, ()
            x, _ = jax.lax.scan(body, x, None, length=k)
            return x
        return f

    def make_edt(k):
        @jax.jit
        def f(g):
            def body(g, _):
                r = batch_edt(g, max_width=mw, env_variant="fusepay",
                              p1="pallas", mid=True)["dist_sq"]
                return (g + (r.reshape(-1)[0] % 1).astype(g.dtype)), ()
            g, _ = jax.lax.scan(body, g, None, length=k)
            return g
        return f

    results = {}
    jobs = []
    for k in (1, 4, 16):
        jobs.append((f"copy_{k}", make_copy(k), buf))
        jobs.append((f"edt_{k}", make_edt(k), glb))
    # compile everything first
    for name, f, x in jobs:
        np.asarray(f(x))
    # interleaved best-of-3, chained x4 dispatches per sample
    for rep in range(3):
        for name, f, x in jobs:
            t0 = time.perf_counter()
            y = x
            for _ in range(4):
                y = f(y)
            np.asarray(y)
            ms = (time.perf_counter() - t0) * 1e3 / 4
            results.setdefault(name, []).append(ms)
    out = {name: round(min(v), 2) for name, v in results.items()}
    # per-iteration normalisation
    norm = {name: round(out[name] / int(name.split("_")[1]), 2)
            for name in out}
    print(json.dumps({"metric": "throttle_quantum_ms_per_program", **out,
                      "per_iteration_ms": norm}), flush=True)


if __name__ == "__main__":
    main()
