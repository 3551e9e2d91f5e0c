"""Characterise the shared-TPU throttle: in the same run, time (a) a pure
HBM-bandwidth op (big int32 copy+add), (b) a pure-VPU op (many fused
multiply-adds on a small resident block), (c) the real envelope kernel, and
(d) a full batch_edt.  If throttled windows slow (a) and (b) equally, the
throttle is duty-cycle-shaped and HBM-traffic cuts cannot show up in them —
only quiet-window A/Bs can judge traffic work (see bench_edt_allin_ab)."""
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

K = 16
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "4"))


def chained(fn, arg):
    @jax.jit
    def chain(a):
        def body(a, _):
            r = fn(a)
            probe = r.reshape(-1)[0]
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
    print("backend:", jax.default_backend(), file=sys.stderr)
    rng = np.random.default_rng(0)

    # (a) bandwidth: 64 MB read + 64 MB write per iteration
    big = jnp.asarray(rng.integers(0, 1 << 20, (16 * 1024 * 1024,), np.int32))
    bw = chained(lambda a: a * 3 + 1, big)

    # (b) compute: 512 fused int ops on a 64 KB block (HBM negligible)
    small = jnp.asarray(rng.integers(1, 100, (128, 128), np.int32))

    def flops(a):
        x = a
        for _ in range(512):
            x = x * 3 + a
        return x

    comp = chained(flops, small)

    # (c) the real envelope on a cow-lady-ish phase-2 shape
    from gie_mapping_tpu.ops.pallas.envelope import envelope_pallas

    f = np.full((152, 80 * 152), 1 << 28, np.int32)
    hit = rng.random(f.shape) < 0.03
    f[hit] = rng.integers(0, 400, hit.sum())
    fj = jnp.asarray(f)
    env = chained(lambda a: envelope_pallas(a, (a,), packed_out=True,
                                            fusepay=True)[0], fj)

    # (d) full cow-lady batch_edt
    from gie_mapping_tpu.ops.edt_batch import batch_edt

    occ = np.zeros((152, 152, 80), np.int8)
    n = int(0.03 * 152 * 152 * 25)
    occ[rng.integers(0, 152, n), rng.integers(0, 152, n),
        rng.integers(20, 45, n)] = 2
    glb = jnp.asarray(occ)
    edt = chained(lambda g: batch_edt(g, max_width=384)["dist_sq"], glb)

    # per-iteration accounting:
    #   bw: the scan carry guarantees 64 MB read + 64 MB write (0.128 GB);
    #       the probe op r=a*3+1 adds up to another 0.128 GB UNLESS XLA
    #       slice-narrows it through r[0] — so the true figure is in
    #       [0.128, 0.256] GB and the printed GB/s is a range.
    #   comp: 512 unrolled iterations x 2 int-ops (mul+add) x 16384
    #       elements = 16.8 M int-ops per timed iteration.
    print("per-iteration: bw = 128-256 MB moved; comp = 16.8 M int-ops; "
          "env/edt = cow-lady-class")
    for r in range(ROUNDS):
        row = {nm: f() for nm, f in
               (("bw", bw), ("comp", comp), ("env", env), ("edt", edt))}
        gbps_lo = 0.128 / (row["bw"] / 1e3)
        gbps_hi = 0.256 / (row["bw"] / 1e3)
        gops = 0.0168 / (row["comp"] / 1e3)
        print(f"round {r}: bw {row['bw']:.2f} ms "
              f"({gbps_lo:.0f}-{gbps_hi:.0f} GB/s)   "
              f"comp {row['comp']:.2f} ms ({gops:.1f} Gop/s)   "
              f"env {row['env']:.2f} ms   edt {row['edt']:.2f} ms",
              flush=True)
        time.sleep(2)


if __name__ == "__main__":
    main()
