"""A/B: envelope winner-monotonicity carry (mono) off vs on, inside full
batch_edt, across canvas classes.  Interleaved best-of-N; in-run comparison
only.  Also serves as the compile check for the SMEM-carry kernel."""
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

from gie_mapping_tpu.ops.pallas.envelope import envelope_pallas

K = 12
ROUNDS = 4


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
            probe = jax.tree_util.tree_leaves(r)[0].reshape(-1)[0]
            return (a + (probe % 1).astype(a.dtype)).astype(a.dtype), ()
        a, _ = jax.lax.scan(body, a, None, length=K)
        return a

    np.asarray(chain(arg))

    def one_pass():
        t0 = time.perf_counter()
        np.asarray(chain(arg))
        return (time.perf_counter() - t0) / K * 1e3

    return one_pass


def main():
    import functools

    from gie_mapping_tpu.ops import edt_batch as eb

    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady-ish 152x152x80 z20-45 3%", (152, 152, 80), 20, 45, 0.03),
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
    ]
    for name, shape, zlo, zhi, frac in cases:
        occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
        mw = sum(shape)

        def edt_with_mono(g, mono):
            # swap the env closure: batch_edt has no mono flag, so rebuild
            # the zmajor core with an env that carries the flag
            occ_ = g == 2
            env = functools.partial(envelope_pallas, mono=mono,
                                    packed_out=True)
            tzy = lambda a: jnp.transpose(a, (0, 2, 1))
            packed_c, pay3b, zbits = eb._edt_zmajor_core(
                occ_, lambda f, p: env(f, p), mw, shape[2],
                reshard1=tzy, reshard2=lambda a: jnp.moveaxis(a, 1, 0))
            return {"dist_sq": packed_c >> (zbits + 1)}

        # correctness first: one on-device equality run
        a = jax.jit(lambda g: edt_with_mono(g, False))(glb)
        b = jax.jit(lambda g: edt_with_mono(g, True))(glb)
        eq = bool(jnp.array_equal(a["dist_sq"], b["dist_sq"]))
        print(f"{name}: mono==nomono: {eq}")
        if not eq:
            continue

        va = chained(lambda g: edt_with_mono(g, False), glb)
        vb = chained(lambda g: edt_with_mono(g, True), glb)
        best = {"off": 1e9, "on": 1e9}
        for _ in range(ROUNDS):
            best["off"] = min(best["off"], va())
            best["on"] = min(best["on"], vb())
        print(f"{name}:  mono off {best['off']:.2f} ms   on {best['on']:.2f} ms")


if __name__ == "__main__":
    main()
