"""Kernel-efficiency probe: is the envelope Pallas kernel HBM-saturated?

Times, interleaved in the SAME run (so the shared-TPU throttle cancels in the
ratio):

  copy : 1-read/1-write elementwise pass over the phase-2 array
  elem : 2-read/2-write elementwise pass over (f, payload) — the envelope's
         approximate traffic with fusepay+packed_out (read f+pay, write
         packed+pay)
  env  : one envelope_pallas(f, (pay,), packed_out=True, fusepay=True) call
  p1   : one packed Pallas phase-1 scan over the 3-D canvas
  edt  : the full default batch_edt chain (for context)

env/elem >> 1 means the kernel leaves bandwidth on the table (pipelining /
tile-size headroom); env/elem ~ 1 means only pass-count cuts can help —
matching docs/PERF.md's traffic-bound conclusion.
"""
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
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def chained(fn, *args):
    @jax.jit
    def chain(a0, *rest):
        def body(a, _):
            r = fn(a, *rest)
            probe = r.reshape(-1)[0]
            return (a + (probe % 1).astype(a.dtype)).astype(a.dtype), ()
        a, _ = jax.lax.scan(body, a0, None, length=K)
        return a

    np.asarray(chain(*args))  # compile

    def one_pass():
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        return (time.perf_counter() - t0) / K * 1e3

    return one_pass


def phase2_arrays(N, L, frac, seed):
    """A phase-2-shaped (f, payload) pair: f = squared column distances with
    ~frac of lanes carrying finite sites."""
    rng = np.random.default_rng(seed)
    f = np.full((N, L), 1 << 28, np.int32)
    hit = rng.random((N, L)) < frac
    f[hit] = rng.integers(0, 400, hit.sum())
    pay = rng.integers(0, 1 << 16, (N, L)).astype(np.int32)
    return jnp.asarray(f), jnp.asarray(pay)


def main():
    from gie_mapping_tpu.ops.pallas.envelope import envelope_pallas
    from gie_mapping_tpu.ops.pallas.phase1 import phase1_packed_pallas
    from gie_mapping_tpu.ops.edt_batch import batch_edt

    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow-phase2 152x12160", 152, 80 * 152, 0.03),
        ("depthcam-phase2 232x37120", 232, 160 * 232, 0.01),
    ]
    rng = np.random.default_rng(0)

    timers = {}
    for name, N, L, frac in cases:
        f, pay = phase2_arrays(N, L, frac, seed=0)
        timers[(name, "copy")] = chained(lambda a: a + 1, f)
        timers[(name, "elem")] = chained(
            lambda a, p: (a + p) * 3 + (a - p), f, pay)
        timers[(name, "env")] = chained(
            lambda a, p: envelope_pallas(a, (p,), packed_out=True,
                                         fusepay=True)[0], f, pay)

    # packed phase 1 + full EDT on the depthcam-class canvas
    occ = np.zeros((232, 232, 160), np.int8)
    n = int(0.01 * 232 * 232 * 40)
    occ[rng.integers(0, 232, n), rng.integers(0, 232, n),
        rng.integers(40, 80, n)] = 2
    glb = jnp.asarray(occ)
    mw = 232 + 232 + 160
    timers[("canvas", "p1")] = chained(
        lambda g: phase1_packed_pallas(g, mw), glb)
    timers[("canvas", "edt")] = chained(
        lambda g: batch_edt(g, max_width=mw, env_variant="fusepay")["dist_sq"],
        glb)

    samples = {k: [] for k in timers}
    for r in range(ROUNDS):
        row = [f"round {r}:"]
        for key in timers:
            t = timers[key]()
            samples[key].append(t)
            row.append(f"{key[0].split()[0]}/{key[1]}={t:.2f}")
        print("  ".join(row), flush=True)

    print("\nbest-of-run (ms) and ratios:")
    for name, N, L, frac in cases:
        c = min(samples[(name, "copy")])
        e = min(samples[(name, "elem")])
        v = min(samples[(name, "env")])
        gb = 2 * 4 * N * L / 1e9
        print(f"  {name}: copy {c:.3f} ({gb / (c / 1e3):.0f} GB/s)  "
              f"elem {e:.3f}  env {v:.3f}  env/elem = {v / e:.2f}")
    print(f"  canvas p1 {min(samples[('canvas', 'p1')]):.3f}  "
          f"edt {min(samples[('canvas', 'edt')]):.3f}")


if __name__ == "__main__":
    main()
