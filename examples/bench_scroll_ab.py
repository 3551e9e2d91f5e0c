"""A/B the compact scroll: XLA transposes vs Pallas block-row DMA kernels.

Alternates the canvas origin between two x-positions so every scroll moves a
real one-block slab out and back in through the archive (the ordinary-scroll
workload). Same-run comparison only (shared TPU throttles)."""
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

from gie_mapping_tpu.map_state import MapState, _do_scroll
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
        return c.dist_sq[0, 0, 0] + c.origin_blk[0]

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
    rng = np.random.default_rng(0)
    st = MapState.create(cfg)
    st = dataclasses.replace(
        st,
        vox_type=jnp.asarray(
            np.where(rng.random(cfg.canvas_size) < 0.03, 2, 1).astype(np.int8)),
        present=jnp.asarray(rng.random(cb) < 0.9),
    )
    print("backend:", jax.default_backend(), "cb:", cb, file=sys.stderr)
    _LAT[0] = link_latency()

    def make(use_pallas, compact, cols=64, archive_pallas=None):
        def step(s):
            # alternate x origin 0 <-> 1: every scroll moves a one-block slab
            new_o = jnp.stack(
                [1 - s.origin_blk[0], s.origin_blk[1], s.origin_blk[2]])
            return _do_scroll(s, new_o, cfg, compact_rows=compact,
                              compact_cols=cols, use_pallas=use_pallas,
                              archive_pallas=archive_pallas)
        return step

    variants = [
        ("xla compact-256", make(False, 256)),
        ("pallas cols-64, xla archive rows", make(True, 256, 64, False)),
        ("pallas cols-64 + pallas archive rows", make(True, 256, 64, True)),
        ("pallas cols-32 + pallas archive rows", make(True, 256, 32, True)),
        ("xla full", make(False, None)),
    ]
    for _pass in range(2):  # second pass exposes throttle drift
        for name, fn in variants:
            print(f"{name}: {timed(fn, st):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
