"""Compiler-measured HBM traffic per EDT variant — throttle-independent.

XLA's `compiled.cost_analysis()` reports "bytes accessed" for the whole
executable (all fusions + pallas_call operands/outputs), so the variant
ladder can be compared WITHOUT quiet hardware: run-time A/Bs on the shared
tunnel are throttle-noise-bound (docs/PERF.md §1), but the compiler's byte
count is a property of the program.  Ratios vs the default quantify exactly
how much traffic each variant removes; they are the expected quiet-window
speedup bound for the HBM-bound regime.

Compile-only (no kernel execution beyond caching); uses the persistent
compile cache, so re-runs are cheap.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cc():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_cc()

import jax
import jax.numpy as jnp

from gie_mapping_tpu.ops.edt_batch import batch_edt

CASES = [
    ("cow_lady", (152, 152, 80)),
    ("depthcam", (232, 232, 160)),
    ("ugv_corridor", (232, 232, 56)),
]

VARIANTS = {
    "default": dict(env_variant="fusepay"),
    "p1": dict(env_variant="fusepay", p1="pallas"),
    "mid": dict(env_variant="fusepay", mid=True),
    "allin": dict(env_variant="fusepay", p1="pallas", mid=True),
    "cf": dict(env_variant="cf"),
}


def audit(shape, kw):
    occ = jnp.zeros(shape, jnp.int8)
    mw = sum(shape)

    def run(g):
        r = batch_edt(g, max_width=mw, **kw)
        return r["dist_sq"], r["coc"], r["valid"]

    c = jax.jit(run).lower(occ).compile()
    d = c.cost_analysis()
    if isinstance(d, (list, tuple)):
        d = d[0]
    return float(d.get("bytes accessed", float("nan")))


def main():
    backend = jax.default_backend()
    print("backend:", backend, file=sys.stderr)
    # on CPU the pallas gates make every variant compile the identical dense
    # program — the ratios would read ~1.0 and mean nothing
    assert backend in ("tpu", "axon"), (
        f"audit requires the TPU backend (got {backend}); ratios are "
        "meaningless under the CPU fallback")
    for name, shape in CASES:
        base = None
        row = {}
        for vname, kw in VARIANTS.items():
            b = audit(shape, kw)
            if vname == "default":
                base = b
            row[vname] = {"mb": round(b / 1e6, 1),
                          "vs_default": round(b / base, 3)}
        print(json.dumps({"case": name, "shape": shape,
                          "bytes_accessed": row}), flush=True)


if __name__ == "__main__":
    main()
