"""EDT-internal cost split on TPU: phase 1, envelope passes, transposes.

Times each piece with chained dispatches + one readback (link RTT cancelled
by comparing within the run).  Cases mirror bench_edt_ab's occupancy models.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from gie_mapping_tpu.ops.edt_batch import _phase1_along_y, batch_edt
from gie_mapping_tpu.ops.pallas.envelope import envelope_pallas

K = 12


def make_occ(shape, zlo, zhi, frac, seed):
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    n = int(frac * X * Y * (zhi - zlo))
    occ[rng.integers(0, X, n), rng.integers(0, Y, n),
        rng.integers(zlo, zhi, n)] = 1
    return occ


def timed(fn, arg):
    @jax.jit
    def chain(a):
        def body(a, _):
            r = fn(a)
            probe = jax.tree_util.tree_leaves(r)[0].reshape(-1)[0]
            a2 = (a + (probe % 1).astype(a.dtype)).astype(a.dtype)
            return a2, ()
        a, _ = jax.lax.scan(body, a, None, length=K)
        return a

    np.asarray(chain(arg))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(arg))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady-ish 152x152x80 z20-45 3%", (152, 152, 80), 20, 45, 0.03),
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
    ]
    for name, shape, zlo, zhi, frac in cases:
        X, Y, Z = shape
        occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
        mw = sum(shape)

        def full(g):
            return batch_edt(g, max_width=mw)["dist_sq"]

        def p1(g):
            g1, coc, valid = _phase1_along_y(g == 2, mw)
            return jnp.where(valid, g1 * g1, 1 << 28), (coc << 1) | valid

        # phase-2-shaped envelope input (z-major lanes), realistic bands
        g1sq_h, pay_h = jax.jit(p1)(glb)
        g1sq_t = jnp.transpose(g1sq_h, (0, 2, 1))
        pay_t = jnp.transpose(pay_h, (0, 2, 1))

        def env2(a):
            b, s, p = envelope_pallas(a, (pay_t,))
            return b

        # phase-3-shaped input: [Z, X, Y]
        d2 = jnp.moveaxis(g1sq_t, 1, 0)
        pay3 = jnp.moveaxis(pay_t, 1, 0)

        def env3(a):
            b, s, p = envelope_pallas(a, (pay3,))
            return b

        def transposes(g):
            a = jnp.transpose(g, (0, 2, 1))
            b = jnp.moveaxis(a, 1, 0)
            c = jnp.moveaxis(b, 0, 2)
            return c

        rows = [
            ("full batch_edt", lambda: timed(full, glb)),
            ("phase1 (+pack)", lambda: timed(lambda g: p1(g)[0], glb)),
            ("env phase2 [X,Z,Y]", lambda: timed(env2, g1sq_t)),
            ("env phase3 [Z,X,Y]", lambda: timed(env3, d2)),
            ("3x int32 canvas transposes", lambda: timed(transposes, g1sq_h)),
        ]
        print(name)
        for rname, fn in rows:
            print(f"  {rname}: {fn():.2f} ms")


if __name__ == "__main__":
    main()
