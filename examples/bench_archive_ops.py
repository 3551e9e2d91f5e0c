"""How do XLA row scatter/gather costs scale with index count on this part?

Archive shapes: a_packed [B=11997, 512, 3] uint32; canvas has 3610 blocks.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K = 10
B = 11997
ROWS = 512 * 3
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
        return jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.float32(y.reshape(-1)[0].astype(jnp.float32)),
            c, jnp.float32(0))

    np.asarray(chain(carry))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(carry))
        best = min(best, time.perf_counter() - t0)
    return (best - _LAT[0]) / K * 1e3


def main():
    rng = np.random.default_rng(0)
    arch = jnp.asarray(rng.integers(0, 2**31, (B, 512, 3)).astype(np.uint32))

    print("backend:", jax.default_backend(), file=sys.stderr)
    _LAT[0] = link_latency()

    for R in (3610, 741, 256, 64):
        idx = jnp.asarray(rng.integers(0, B, R).astype(np.int32))
        rows = jnp.asarray(rng.integers(0, 2**31, (R, 512, 3)).astype(np.uint32))

        def scat(a):
            i2 = (idx + a[0, 0, 0].astype(jnp.int32)) % B
            return a.at[i2].set(rows)

        def gath(c):
            i2 = (idx + c[0, 0, 0].astype(jnp.int32)) % B
            return arch[i2] + c * 0 + 1

        print(f"rows={R}: scatter {timed(scat, arch):.2f} ms  "
              f"gather {timed(gath, rows):.2f} ms")

    # scalar scatter (directory build): 3610 indices, 4B payload
    d = jnp.zeros((B,), jnp.int32)
    sidx = jnp.asarray(rng.integers(0, B, 3610).astype(np.int32))

    def sscat(c):
        i2 = (sidx + c[0].astype(jnp.int32)) % B
        return c.at[i2].set(jnp.arange(3610, dtype=jnp.int32))

    print(f"scalar scatter 3610: {timed(sscat, d):.2f} ms")

    # dense slab exchange for comparison: dynamic_update_slice of a
    # 190-block slab (equivalent bytes) into a [B,512,3] buffer
    slab = jnp.asarray(rng.integers(0, 2**31, (190, 512, 3)).astype(np.uint32))

    def dus(a):
        s = (a[0, 0, 0].astype(jnp.int32) % 64) * 8
        return jax.lax.dynamic_update_slice(a, slab, (s, 0, 0))

    print(f"dense slab dus 190 rows: {timed(dus, arch):.2f} ms")


if __name__ == "__main__":
    main()
