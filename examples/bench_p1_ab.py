"""A/B: batch_edt phase 1 via XLA cummax/cummin vs the packed Pallas scan
kernel (ops/pallas/phase1.py, p1="pallas").  Interleaved chained-dispatch
timing; compare within one run only (the shared TPU throttles 3-20x)."""
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

from gie_mapping_tpu.ops.edt_batch import batch_edt

K = 12
ROUNDS = 6


def make_occ(shape, zlo, zhi, frac, seed):
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    n = int(frac * X * Y * (zhi - zlo))
    occ[rng.integers(0, X, n), rng.integers(0, Y, n),
        rng.integers(zlo, zhi, n)] = 1
    return occ


def chained(fn, arg):
    @jax.jit
    def chain(a):
        def body(a, _):
            r = fn(a)
            probe = r["dist_sq"].reshape(-1)[0]
            return (a + (probe % 1).astype(a.dtype)).astype(a.dtype), ()
        a, _ = jax.lax.scan(body, a, None, length=K)
        return a

    np.asarray(chain(arg))  # compile

    def one_pass():
        t0 = time.perf_counter()
        np.asarray(chain(arg))
        return (time.perf_counter() - t0) / K * 1e3

    return one_pass


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady-ish 152x152x80 z20-45 3%", (152, 152, 80), 20, 45, 0.03),
        ("ugv-ish 232x232x56 z10-40 2%", (232, 232, 56), 10, 40, 0.02),
        ("laser3D-ish 112x112x40 z8-32 2%", (112, 112, 40), 8, 32, 0.02),
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
    ]
    for name, shape, zlo, zhi, frac in cases:
        occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
        mw = sum(shape)
        va = chained(lambda g: batch_edt(g, max_width=mw, p1="xla"), glb)
        vb = chained(lambda g: batch_edt(g, max_width=mw, p1="pallas"), glb)
        best = {"xla": 1e9, "pallas": 1e9}
        samples = {"xla": [], "pallas": []}
        for _ in range(ROUNDS):
            for nm, f in (("xla", va), ("pallas", vb)):
                t = f()
                best[nm] = min(best[nm], t)
                samples[nm].append(t)
        med = {k: sorted(v)[len(v) // 2] for k, v in samples.items()}
        print(f"{name}:  xla best {best['xla']:.2f} med {med['xla']:.2f}   "
              f"pallas best {best['pallas']:.2f} med {med['pallas']:.2f} ms")


if __name__ == "__main__":
    main()
