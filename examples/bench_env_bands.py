"""TPU check + A/B for the envelope's per-chunk coarse-to-fine bands.

1. Correctness on REAL hardware: batch_edt with the Pallas envelope must
   match the XLA lower_envelope path exactly on valid voxels.
2. In-run timing: bands on vs off at cow-lady and depthcam scale.
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

from gie_mapping_tpu.ops.edt_batch import batch_edt

K = 12


def make_occ(shape, zlo, zhi, frac, seed):
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    occ = np.zeros(shape, np.int8)
    n = int(frac * X * Y * (zhi - zlo))
    occ[rng.integers(0, X, n), rng.integers(0, Y, n),
        rng.integers(zlo, zhi, n)] = 1
    return occ


def check_exact(glb, mw):
    a = batch_edt(glb, max_width=mw, pallas=True)
    b = batch_edt(glb, max_width=mw, pallas=False)
    va, vb = np.asarray(a["valid"]), np.asarray(b["valid"])
    assert (va == vb).all(), "valid mask mismatch"
    for k in ("dist_sq", "coc"):
        xa, xb = np.asarray(a[k]), np.asarray(b[k])
        sel = va if xa.ndim == 3 else va[..., None] & np.ones_like(xb, bool)
        assert (xa[va] == xb[va]).all() if xa.ndim == 3 else \
            (xa[va, :] == xb[va, :]).all(), k
    print("  exact vs XLA path: OK")


def timed(glb, mw, bands):
    import gie_mapping_tpu.ops.pallas.envelope as env_mod
    from gie_mapping_tpu.ops import edt_batch

    @jax.jit
    def chain(g):
        def body(g, _):
            env = lambda f, p: env_mod.envelope_pallas(f, p, bands=bands,
                                                       packed_out=True)
            occ = g == 2
            g1, c1, v1 = edt_batch._phase1_along_y(occ, mw)
            g1sq = jnp.where(v1, g1 * g1, 1 << 28)
            pay = (c1 << 1) | v1.astype(jnp.int32)
            pc, pb, zb = edt_batch._edt_zmajor_core(
                occ, env, mw, g.shape[2],
                reshard1=lambda a: jnp.transpose(a, (0, 2, 1)),
                reshard2=lambda a: jnp.moveaxis(a, 1, 0))
            g2 = (g + (pc[0, 0, 0] % 1).astype(g.dtype)).astype(g.dtype)
            return g2, ()
        g, _ = jax.lax.scan(body, g, None, length=K)
        return g

    np.asarray(chain(glb))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(glb))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady-ish 152x152x80 z20-45 3%", (152, 152, 80), 20, 45, 0.03),
        ("depthcam-ish 232x232x160 z40-80 1%", (232, 232, 160), 40, 80, 0.01),
        ("depthcam-frustum 232x232x160 0.2%", (232, 232, 160), 20, 140, 0.002),
    ]
    for name, shape, zlo, zhi, frac in cases:
        occ = make_occ(shape, zlo, zhi, frac, seed=0)
        glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
        mw = sum(shape)
        print(name)
        check_exact(glb, mw)
        for _pass in range(2):
            a = timed(glb, mw, bands=False)
            b = timed(glb, mw, bands=True)
            print(f"  slab-bands {a:.2f} ms   chunk-bands {b:.2f} ms "
                  f"({(a - b) / a * 100:+.1f}%)")


if __name__ == "__main__":
    main()
