"""A/B/C/D: envelope kernel variants inside full batch_edt, across canvas
classes — base, mono (winner-monotonicity carry), fusepay (single-loop
payload select), and mono+fusepay.  Interleaved best-of-N; in-run comparison
only (the shared link throttles).  Correctness (vs base) checked on device
first.  Run on quiet hardware to decide default flips (docs/ROADMAP.md)."""
import os
import sys
import time
import functools

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

from gie_mapping_tpu.ops import edt_batch as eb
from gie_mapping_tpu.ops.pallas.envelope import envelope_pallas

K = 12
ROUNDS = 4
VARIANTS = {
    "base": dict(),
    "fusepay": dict(fusepay=True),
    "cf": dict(cf=True, fusepay=True),
    "cf_base": dict(cf=True),
}


def make_occ(shape, zlo, zhi, frac, seed):
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    n = int(frac * X * Y * max(zhi - zlo, 1))
    occ[rng.integers(0, X, n), rng.integers(0, Y, n),
        rng.integers(zlo, zhi, n)] = 1
    return occ


def make_frustum(shape, seed):
    """Depth-camera-like occupancy: a wall surface seen through a camera
    frustum from one canvas corner region — sites localized in a cone, the
    rest of the canvas siteless.  This is the regime the coarse-to-fine
    winner brackets target (random-sprinkle cases have sites everywhere, so
    radius bands are already tight there)."""
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    cam = np.array([20, Y // 2, Z // 2])
    yy, zz = np.meshgrid(np.arange(Y), np.arange(Z), indexing="ij")
    # per-(y,z) ray: wall depth where the frustum ray hits, with noise
    depth = (90 + 25 * np.sin(yy / 9.0) * np.cos(zz / 7.0)
             + rng.integers(-3, 4, (Y, Z))).astype(np.int64)
    xw = np.clip(cam[0] + depth, 0, X - 1)
    in_fov = ((np.abs(yy - cam[1]) < 0.45 * depth)
              & (np.abs(zz - cam[2]) < 0.30 * depth))
    ys, zs = np.nonzero(in_fov)
    occ[xw[ys, zs], ys, zs] = 1
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
    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady-ish 152x152x80 z20-45 3%", (152, 152, 80), 20, 45, 0.03),
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
        ("depthcam-frustum 232x232x160", (232, 232, 160), None, None, None),
        ("ugv-ish 240x240x40 z0-24 2%", (240, 240, 40), 0, 24, 0.02),
    ]
    for name, shape, zlo, zhi, frac in cases:
        if frac is None:
            occ = make_frustum(shape, seed=0)
        else:
            occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
        mw = sum(shape)

        def edt_with(g, **kw):
            occ_ = g == 2
            env = functools.partial(envelope_pallas, packed_out=True, **kw)
            tzy = lambda a: jnp.transpose(a, (0, 2, 1))
            packed_c, pay3b, zbits = eb._edt_zmajor_core(
                occ_, lambda f, p: env(f, p), mw, shape[2],
                reshard1=tzy, reshard2=lambda a: jnp.moveaxis(a, 1, 0))
            return {"d": packed_c >> (zbits + 1), "p": pay3b}

        base = jax.jit(lambda g: edt_with(g))(glb)
        timers, ok = {}, {}
        for vname, kw in VARIANTS.items():
            r = jax.jit(functools.partial(edt_with, **kw))(glb)
            valid = np.asarray(base["p"] & 1, bool)
            # compare on valid lanes only: siteless lanes carry variant-
            # dependent (masked-downstream) garbage
            ok[vname] = (np.array_equal(np.asarray(r["d"])[valid],
                                        np.asarray(base["d"])[valid])
                         and np.array_equal(np.asarray(r["p"])[valid],
                                            np.asarray(base["p"])[valid]))
            timers[vname] = chained(functools.partial(edt_with, **kw), glb)
        print(f"{name}: equal(valid)={ok}")
        best = {v: 1e9 for v in VARIANTS}
        for _ in range(ROUNDS):
            for v in VARIANTS:
                best[v] = min(best[v], timers[v]())
        print("  " + "   ".join(f"{v} {best[v]:.2f}ms" for v in VARIANTS))


if __name__ == "__main__":
    main()
