"""On-device sanity: compiled Pallas kernels vs dense XLA oracles.

Interpret-mode tests (tests/test_envelope_pallas.py) pin kernel semantics on
CPU; this script pins the COMPILED Mosaic kernels on the real TPU — run it
after any kernel change, before trusting bench numbers.  Exits nonzero on
any mismatch.
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


def make_glb(shape, zlo, zhi, frac, seed):
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    n = int(frac * X * Y * max(zhi - zlo, 1))
    occ[rng.integers(0, X, n), rng.integers(0, Y, n),
        rng.integers(zlo, zhi, n)] = 1
    return np.where(occ, 2, 1).astype(np.int8)


def main():
    from gie_mapping_tpu.ops.edt_batch import batch_edt

    print("backend:", jax.default_backend(), file=sys.stderr)
    failures = 0
    cases = [
        ("cow_lady-ish 152x152x80", (152, 152, 80), 20, 45, 0.03),
        ("thin 2.5-D 96x96x8", (96, 96, 8), 0, 8, 0.02),
        ("sparse tall 120x120x128", (120, 120, 128), 100, 120, 0.003),
        ("empty canvas 64x64x32", (64, 64, 32), 0, 1, 0.0),
    ]
    for name, shape, zlo, zhi, frac in cases:
        glb = jnp.asarray(make_glb(shape, zlo, zhi, frac, seed=3))
        mw = sum(shape)
        t0 = time.perf_counter()
        got = batch_edt(glb, max_width=mw, pallas=True)
        got = {k: np.asarray(v) for k, v in got.items()}
        t1 = time.perf_counter()
        ref = batch_edt(glb, max_width=mw, pallas=False)
        ref = {k: np.asarray(v) for k, v in ref.items()}
        ok = all(np.array_equal(got[k], ref[k])
                 for k in ("dist_sq", "coc", "valid"))
        # mid (transpose-free phase-3) variant
        gotm = batch_edt(glb, max_width=mw, pallas=True, mid=True)
        okm = all(np.array_equal(np.asarray(gotm[k]), ref[k])
                  for k in ("dist_sq", "coc", "valid"))
        print(f"{name}: pallas==dense {ok}  mid==dense {okm}  "
              f"(first pass {1e3*(t1-t0):.0f} ms incl. compile)")
        failures += (not ok) + (not okm)

    # scipy cross-check on one case (dist only; scipy has different tie cocs)
    from scipy import ndimage

    glb = make_glb((96, 96, 48), 10, 30, 0.02, seed=4)
    got = batch_edt(jnp.asarray(glb), max_width=240, pallas=True)
    d = np.asarray(got["dist_sq"], np.float64)
    sp = ndimage.distance_transform_edt(glb != 2) ** 2
    ok = np.allclose(np.where(np.asarray(got["valid"]), d, sp), sp)
    print("scipy dist_sq equality:", ok)
    failures += not ok

    if failures:
        print(f"FAILED: {failures} mismatches", file=sys.stderr)
        sys.exit(1)
    print("all on-device checks passed")


if __name__ == "__main__":
    main()
