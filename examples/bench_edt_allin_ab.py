"""Interleaved A/B of the batch-EDT traffic variants on the live TPU:

  default : fusepay envelope, XLA phase 1, transposed phase 3
  p1      : + packed Pallas phase-1 scan (p1="pallas")
  mid     : + transpose-free batched phase 3 (mid=True)
  allin   : p1 + mid together (the minimum-traffic chain:
            ~15 full-canvas passes vs ~25-30 for default)

All bit-identical (tpu_sanity).  Each round re-times every variant
back-to-back and prints a cow-lady quietness probe first — per CLAUDE.md the
shared TPU throttles 3-20x, so only same-round comparisons are meaningful and
rounds with probe <~2.5 ms are quiet enough to judge by."""
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
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))

VARIANTS = {
    "default": dict(env_variant="fusepay"),
    "p1": dict(env_variant="fusepay", p1="pallas"),
    "mid": dict(env_variant="fusepay", mid=True),
    "allin": dict(env_variant="fusepay", p1="pallas", mid=True),
}


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
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
        ("ugv-ish 232x232x56 z10-40 2%", (232, 232, 56), 10, 40, 0.02),
    ]
    timers = {}
    for name, shape, zlo, zhi, frac in cases:
        occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
        mw = sum(shape)
        for vname, kw in VARIANTS.items():
            timers[(name, vname)] = chained(
                lambda g, kw=kw: batch_edt(g, max_width=mw, **kw), glb)
    probe = timers[(cases[0][0], "default")]

    samples = {k: [] for k in timers}
    for r in range(ROUNDS):
        q = probe()
        row = [f"round {r} probe {q:.2f} ms"]
        for name, _, _, _, _ in cases:
            for vname in VARIANTS:
                t = timers[(name, vname)]()
                samples[(name, vname)].append(t)
            row.append(name.split()[0] + " " + " ".join(
                f"{vname}={samples[(name, vname)][-1]:.2f}"
                for vname in VARIANTS))
        print("\n  ".join(row), flush=True)

    print("\nbest-of-run:")
    for name, _, _, _, _ in cases:
        print(f"  {name}: " + "  ".join(
            f"{vname} {min(samples[(name, vname)]):.2f}"
            for vname in VARIANTS))


if __name__ == "__main__":
    main()
