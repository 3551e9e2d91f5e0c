"""A/B micro-bench: phase-2 lane ordering in batch_edt (zmajor on/off).

Times the full EDT (pallas envelope) on the real TPU by chaining K
dispatches with a data dependency and doing ONE readback, per the repo
timing rules (CLAUDE.md).  Compares within one process/run so link
throttle cancels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gie_mapping_tpu.ops.edt_batch import batch_edt

K = 12


def make_occ(shape, zlo, zhi, frac, seed):
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    n = int(frac * X * Y * (zhi - zlo))
    xs = rng.integers(0, X, n)
    ys = rng.integers(0, Y, n)
    zs = rng.integers(zlo, zhi, n)
    occ[xs, ys, zs] = 1
    return occ


def time_variant(glb, max_width, zmajor):
    @jax.jit
    def chain(g):
        def body(g, _):
            r = batch_edt(g, max_width=max_width, zmajor=zmajor)
            # data dependency: xor a value derived from the result back in
            g2 = (g + (r["dist_sq"][0, 0, 0] % 1).astype(g.dtype)).astype(g.dtype)
            return g2, r["dist_sq"][0, 0, 0]
        g, outs = jax.lax.scan(body, g, None, length=K)
        return outs

    # compile + warm
    np.asarray(chain(glb))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(glb))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best / K * 1e3  # ms per EDT


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady-ish 152x152x80 z20-45 3%", (152, 152, 80), 20, 45, 0.03),
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
    ]
    for name, shape, zlo, zhi, frac in cases:
        occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))  # VOX_OCCUPIED=2
        mw = sum(shape)
        # interleave orders to cancel slow throttle drift
        a1 = time_variant(glb, mw, zmajor=False)
        b1 = time_variant(glb, mw, zmajor=True)
        a2 = time_variant(glb, mw, zmajor=False)
        b2 = time_variant(glb, mw, zmajor=True)
        a, b = min(a1, a2), min(b1, b2)
        print(f"{name}: ymajor {a:.2f} ms  zmajor {b:.2f} ms  "
              f"({(a - b) / a * 100:+.1f}% zmajor win)")


if __name__ == "__main__":
    main()
