"""Exact 3-phase separable Euclidean distance transform with
closest-obstacle-coordinate (coc) tracking.

TPU-native redesign of the reference's batch local EDT
(/root/reference/src/kernel/edt/local_edt_core.h:14-193,
 src/kernel/edt/local_edt.cu:7-28):

* Phase 1 (along y) — the reference runs two serial per-column passes on the
  GPU.  Here it is two `lax.cummax`/`lax.cummin` scans (XLA log-depth
  parallel prefix), fully vectorised over all (x,z) lanes: the nearest
  occupied index at-or-below y IS the running cummax of `where(occ, y, -1)`,
  so no explicit loop survives.
* Phases 2/3 (lower envelope along x, then z) — the reference uses a serial
  Felzenszwalb parabola stack per line plus cuTT tensor transposes.  On TPU
  the exact envelope `min_i ((x-i)^2 + f(i))` is computed as a chunked dense
  min-reduction: for line length n this is O(n^2) multiply-add-mins of
  perfectly regular VPU work — far below the memory roofline for n ~ 100-250
  and with no serial dependency.  The cuTT transposes disappear
  (jnp.moveaxis is free under XLA layout assignment).

The coc is carried exactly as in the reference (local_edt_core.h:116-134,
169-192), but — crucially for TPU — via *fused payload selection inside the
min-reduction* rather than post-hoc argmin gathers: `take_along_axis` lowers
to serialized TPU gathers that cost ~100x the envelope itself, so each
envelope pass also reduces its upstream coc components through a one-hot
mask.  Value+argmin come from ONE packed int32 min reduce.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.constants import EMPTY_VALUE, INVALID_COC, VOX_OCCUPIED

# "infinite" squared cost; safe from int32 overflow.  Deliberately a numpy
# scalar: a module-level jnp constant would initialise the JAX backend at
# import time (hanging imports when the remote TPU plugin is unreachable and
# defeating later jax_platforms switches).
import numpy as _np

_BIG = _np.int32(1 << 28)


def _phase1_along_y(occ, max_width):
    """1-D distance-to-nearest-occupied along axis 1, with nearest index.

    Returns (g1, coc_y, valid): g1 int32 in [0, max_width], coc_y int32.
    Reference: EDTphase1 (local_edt_core.h:14-82); the tie at equal forward /
    backward distance resolves to the forward (lower-y) obstacle exactly as
    the reference's strict `<` comparison does (local_edt_core.h:69).
    """
    X, Y, Z = occ.shape
    y_idx = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
    big = jnp.int32(1 << 29)

    last_le = jax.lax.cummax(jnp.where(occ, y_idx, -1), axis=1)
    next_ge = jax.lax.cummin(jnp.where(occ, y_idx, big), axis=1, reverse=True)

    d_fwd = jnp.where(last_le >= 0, y_idx - last_le, max_width)
    d_bwd = jnp.where(next_ge < big, next_ge - y_idx, max_width)

    g1 = jnp.minimum(jnp.minimum(d_fwd, d_bwd), max_width).astype(jnp.int32)
    coc_y = jnp.where(d_fwd <= d_bwd, last_le, next_ge).astype(jnp.int32)
    valid = g1 < max_width
    return g1, coc_y, valid


def phase1_packed_xla(occ, max_width: int):
    """XLA twin of ops/pallas/phase1.py::phase1_packed_pallas — the SAME
    packed word, bit for bit:

        packed = valid ? (g1^2 << (yb+1)) | (coc_y << 1) | 1 : 0

    Exists so the phase-1 CACHE (models/pipeline.py::_gated_canvas_merge,
    cfg.edt_p1_cache) has one canonical representation on every backend:
    the Pallas kernel produces it on TPU, this on CPU (and both are pinned
    against each other in tests/test_phase1_pallas.py)."""
    from .pallas.phase1 import phase1_pack_bits

    yb = phase1_pack_bits(occ.shape[1])
    g1, coc_y, valid = _phase1_along_y(occ, max_width)
    g1c = jnp.where(valid, g1, 0)
    cocc = jnp.where(valid, coc_y, 0)
    return jnp.where(valid, ((g1c * g1c) << (yb + 1)) | (cocc << 1) | 1, 0)


def phase1_packed(occ, max_width: int, pallas: bool | None = None):
    """Packed phase-1 word via the Pallas scan kernel (TPU) or its XLA twin."""
    if pallas is None:
        pallas = _use_pallas()
    if pallas:
        from .pallas.phase1 import phase1_fits, phase1_packed_pallas

        if phase1_fits(occ.shape[1]):
            return phase1_packed_pallas(occ, max_width)
    return phase1_packed_xla(occ, max_width)


def lower_envelope(fsq, payloads=(), chunk: int = 8,
                   packed_out: bool = False):
    """Exact lower envelope min_i ((x-i)^2 + fsq[i]) along axis 0.

    fsq: int32 [N, ...].  payloads: per-site int32 arrays [N, ...] whose
    winning-site values are co-selected without gathers.

    Returns (best [N, ...], site [N, ...], *selected_payloads) — or, with
    packed_out, ((best << idx_bits | site), *selected_payloads), matching
    the Pallas kernel's packed output mode.
    Ties resolve to the smallest site index (the packed key (cost<<b)|site is
    unique per site, so every output is selected from the SAME winner).
    """
    N = fsq.shape[0]
    n_chunks = -(-N // chunk)
    idx_bits = env_idx_bits(N)
    cap = (1 << (31 - idx_bits)) - 1
    i_idx = jnp.arange(N, dtype=jnp.int32)
    tail_shape = (1,) * (fsq.ndim - 1)
    i_b = i_idx.reshape((1, N) + tail_shape)
    fsq_c = jnp.minimum(fsq, cap)

    def one_chunk(x_start):
        xs = x_start + jnp.arange(chunk, dtype=jnp.int32)
        dx = xs[:, None] - i_idx[None, :]
        dsq = (dx * dx).reshape((chunk, N) + tail_shape)
        cand = jnp.minimum(dsq + fsq_c[None], cap)
        packed = (cand << idx_bits) | i_b
        best = jnp.min(packed, axis=1)
        site = best & ((1 << idx_bits) - 1)
        outs = [best] if packed_out else [best >> idx_bits, site]
        if payloads:
            hot = i_b == site[:, None]
            for p in payloads:
                outs.append(jnp.max(jnp.where(hot, p[None], jnp.int32(-(1 << 30))), axis=1))
        return tuple(outs)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    res = jax.lax.map(one_chunk, starts)
    flat = (n_chunks * chunk,) + fsq.shape[1:]
    return tuple(r.reshape(flat)[:N] for r in res)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def env_idx_bits(n: int) -> int:
    """Site-index bit budget of the packed envelope key for an n-site axis —
    the single source of truth: the Pallas kernels (ops/pallas/envelope.py),
    the dense fallback (lower_envelope) and every packed-output consumer all
    import this."""
    return (n - 1).bit_length() if n > 1 else 1


_env_idx_bits = env_idx_bits  # internal alias used below

# Envelope-kernel loop variants (ops/pallas/envelope.py): bit-identical on
# valid lanes, different loop shapes.  Dense (non-Pallas) calls ignore them.
_ENV_VARIANTS = {
    "base": {},
    "mono": {"mono": True},
    "fusepay": {"fusepay": True},
    "mono+fusepay": {"mono": True, "fusepay": True},
    # coarse-to-fine: SUB-row sub-chunks with winner-bracket bands + the
    # monotonicity carry (ops/pallas/envelope.py::_cf_bands)
    "cf": {"cf": True, "fusepay": True},
    "cf_base": {"cf": True},
}


def _env_variant_kwargs(env_variant: str) -> dict:
    """Resolve an envelope-variant name, failing loudly on typos (MapConfig
    validates at construction; this guards direct batch_edt callers)."""
    if env_variant not in _ENV_VARIANTS:
        raise ValueError(f"unknown env_variant {env_variant!r}; valid: "
                         f"{sorted(_ENV_VARIANTS)}")
    return _ENV_VARIANTS[env_variant]


def _edt_zmajor_core(occ, env, max_width: int, z_global: int, reshard1,
                     reshard2, env_mid=None, env_packed=None,
                     p1_packed=None):
    """Phases 1-3 of the z-major EDT with pluggable phase-boundary reshards.

    reshard1: [Xl,Y,Z]-layout phase-1 output -> phase-2 [X,Zl,Y] layout
              (single device: transpose; sharded: transpose + all_to_all).
    reshard2: phase-2 [X,Zl,Y] output -> phase-3 [Z,Xl,Y] layout.
    `l` suffixes mark the axis a mesh may shard; z_global is the full Z
    extent (site axis of phase 3) for the coc_z bit budget.

    env / env_mid take (fsq, payloads) and must return the PACKED envelope
    ((best << idx_bits | site), *payloads) — one output array per phase
    instead of two; the unpack shifts here fuse into the next pass.

    env_packed (fn(packed, yb), cfg.edt_phase1="pallas"): phase 1 runs as
    the single-pass Pallas scan kernel (ops/pallas/phase1.py) emitting ONE
    packed (g1sq, coc_y, valid) word per voxel instead of the XLA
    cummax/cummin cascade's two arrays — one reshard1 pass (and half the
    all_to_all bytes when sharded) instead of two, and the phase-2 envelope
    fetches one HBM operand.  Outputs are bit-identical.

    Returns (packed_c [Xl,Y,Z], pay3b [Xl,Y,Z], zbits): packed_c holds
    (dist << zbits+1 | coc_z << 1 | valid), pay3b (coc_x << 11 | coc_y << 1
    | valid)."""
    if p1_packed is not None and env_packed is not None:
        # caller-maintained phase-1 cache (cfg.edt_p1_cache): skip the scan
        from .pallas.phase1 import phase1_pack_bits

        yb = phase1_pack_bits(occ.shape[1])
        f2p = reshard1(p1_packed)
        ib2 = _env_idx_bits(f2p.shape[0])
        pk2, pay2t = env_packed(f2p, yb)
    elif p1_packed is not None:
        # unpack feeds the plain envelope (fuses into its first read)
        from .pallas.phase1 import phase1_pack_bits

        yb = phase1_pack_bits(occ.shape[1])
        g1sq = jnp.where((p1_packed & 1) > 0, p1_packed >> (yb + 1), _BIG)
        pay2 = p1_packed & ((1 << (yb + 1)) - 1)
        f2 = reshard1(g1sq)
        ib2 = _env_idx_bits(f2.shape[0])
        pk2, pay2t = env(f2, (reshard1(pay2),))
    elif env_packed is not None:
        from .pallas.phase1 import phase1_pack_bits, phase1_packed_pallas

        yb = phase1_pack_bits(occ.shape[1])
        packed1 = phase1_packed_pallas(occ, max_width)
        f2p = reshard1(packed1)
        ib2 = _env_idx_bits(f2p.shape[0])
        pk2, pay2t = env_packed(f2p, yb)
    else:
        g1, coc_y1, valid1 = _phase1_along_y(occ, max_width)
        g1sq = jnp.where(valid1, g1 * g1, _BIG)
        # Payloads ride as ONE packed int32 (coords < 2^10, valid 1 bit), so
        # the envelope's payload-select pass runs once instead of once per
        # payload.
        pay2 = (coc_y1 << 1) | valid1.astype(jnp.int32)
        f2 = reshard1(g1sq)
        ib2 = _env_idx_bits(f2.shape[0])
        pk2, pay2t = env(f2, (reshard1(pay2),))
    d2t = pk2 >> ib2
    site2t = pk2 & ((1 << ib2) - 1)
    d2m = jnp.where((pay2t & 1) > 0, d2t, _BIG)        # [X,Zl,Y]
    pay3 = (site2t << 11) | pay2t
    zbits = (z_global - 1).bit_length() + 1
    if env_mid is not None:
        # phase 3 reads phase 2's [X,Zl,Y] layout in place (site axis =
        # middle): the [X,Z,Y]->[Z,X,Y] transpose pair between the two
        # pallas_calls — which XLA cannot fuse across kernel boundaries —
        # never materialises
        ib3 = _env_idx_bits(d2m.shape[1])
        pk3, pay3s = env_mid(d2m, (pay3,))             # [X,Z,Y]
        d3, coc_z3 = pk3 >> ib3, pk3 & ((1 << ib3) - 1)
        d3c = jnp.minimum(d3, (1 << (30 - zbits)) - 1)
        packed_c = jnp.transpose(
            (d3c << (zbits + 1)) | (coc_z3 << 1) | (pay3s & 1), (0, 2, 1))
        pay3b = jnp.transpose(pay3s, (0, 2, 1))        # [Xl,Y,Z]
        return packed_c, pay3b, zbits
    f3 = reshard2(d2m)
    ib3 = _env_idx_bits(f3.shape[0])
    pk3, pay3s = env(f3, (reshard2(pay3),))
    d3, coc_z3 = pk3 >> ib3, pk3 & ((1 << ib3) - 1)
    d3c = jnp.minimum(d3, (1 << (30 - zbits)) - 1)
    packed_c = jnp.moveaxis(
        (d3c << (zbits + 1)) | (coc_z3 << 1) | (pay3s & 1), 0, 2)
    pay3b = jnp.moveaxis(pay3s, 0, 2)                  # [Xl,Y,Z]
    return packed_c, pay3b, zbits


@partial(jax.jit, static_argnames=("max_width", "chunk", "pallas", "zmajor",
                                   "mid", "env_variant", "p1"))
def batch_edt(glb_type, max_width: int, chunk: int = 8, pallas: bool | None = None,
              zmajor: bool = True, mid: bool | None = None,
              env_variant: str = "base", p1: str = "xla", p1_packed=None):
    """Batch local EDT over a dense grid.

    Args:
      glb_type: int8/int32 [X,Y,Z] voxel types; OCCUPIED voxels are sites.
      max_width: X+Y+Z 'infinite' 1-D distance (local_batch.h:46).

    p1_packed: optional precomputed packed phase-1 word [X,Y,Z]
      (phase1_packed / the merge's phase-1 cache) — must equal
      phase1_packed(glb_type == OCCUPIED); phase 1 is then skipped
      (zmajor 3-D path only; ignored in the 2-D/legacy layouts).

    Returns dict with:
      dist_sq: int32 [X,Y,Z] squared Euclidean distance (EMPTY_VALUE where no
               obstacle is reachable — matches the reference's "sees nothing"
               sentinel handling in MarkLimitedObserve,
               unify_helper.cuh:225-231).
      coc:     int32 [X,Y,Z,3] grid coordinate of the closest obstacle
               (INVALID_COC triple where invalid).
      valid:   bool [X,Y,Z].
    """
    occ = glb_type == VOX_OCCUPIED
    X, Y, Z = occ.shape
    if pallas is None:
        pallas = _use_pallas()
    vkw = _env_variant_kwargs(env_variant)
    if pallas:
        from .pallas.envelope import envelope_pallas

        env = lambda f, payloads: envelope_pallas(f, payloads,
                                                  packed_out=True, **vkw)
    else:
        env = lambda f, payloads: lower_envelope(f, payloads=payloads,
                                                 chunk=chunk, packed_out=True)

    # ---- phases: z-major lane order (z, y) ------------------------------
    # Phase-1 validity depends only on (x, z), so z-major lane tiles are
    # spatially coherent and the Pallas kernel's site-free-tile skip engages
    # on sparse maps (depthcam-class).  The z-major [X,Z,Y] layout is kept
    # through the phase-2/3 boundary: [X,Z,Y] -> [Z,X,Y] is ONE transposed
    # pass per packed array, and the return to canvas layout packs
    # (dist, coc_z, valid) into one int32 so it is two passes, not three.
    if mid is None:
        mid = False  # bare-call default; production passes cfg.edt_mid
        # (True — part of the compiler-audited minimum-traffic chain,
        # examples/hlo_traffic_audit.py)
    env_mid = None
    if mid and pallas and zmajor and Z > 1:
        from .pallas.envelope import envelope_mid_pallas

        env_mid = lambda f, payloads: envelope_mid_pallas(
            f, payloads, packed_out=True, **vkw)
    env_packed = None
    if p1 == "pallas" and pallas and zmajor and Z > 1:
        from .pallas.phase1 import phase1_fits

        if phase1_fits(Y):
            from .pallas.envelope import envelope_packed_pallas

            env_packed = lambda f, yb: envelope_packed_pallas(
                f, yb, packed_out=True, **vkw)
        else:
            # packed word out of bits for this extent (Y > 1024): the packed
            # scan is a traffic optimisation, not a capability — degrade to
            # the XLA phase 1 rather than erroring on the default config
            import warnings

            warnings.warn(
                f"edt_phase1='pallas' needs Y <= 1024 (got {Y}); "
                "falling back to the XLA phase 1", stacklevel=2)
    elif p1 != "xla" and p1 != "pallas":
        raise ValueError(f"unknown p1 variant {p1!r}; valid: xla, pallas")
    if zmajor and Z > 1:
        tzy = lambda a: jnp.transpose(a, (0, 2, 1))
        packed_c, pay3b, zbits = _edt_zmajor_core(
            occ, env, max_width, Z,
            reshard1=tzy, reshard2=lambda a: jnp.moveaxis(a, 1, 0),
            env_mid=env_mid, env_packed=env_packed, p1_packed=p1_packed)
        dist_sq = packed_c >> (zbits + 1)
        coc_z = (packed_c >> 1) & ((1 << zbits) - 1)
        coc_x = pay3b >> 11
        coc_y = (pay3b >> 1) & ((1 << 10) - 1)
        valid = (packed_c & 1) > 0
    else:
        tzy = (lambda a: jnp.transpose(a, (0, 2, 1))) if zmajor else (lambda a: a)
        g1, coc_y1, valid1 = _phase1_along_y(occ, max_width)
        g1sq = jnp.where(valid1, g1 * g1, _BIG)
        pay2 = (coc_y1 << 1) | valid1.astype(jnp.int32)
        f2 = tzy(g1sq)
        ib2 = _env_idx_bits(f2.shape[0])
        pk2t, pay2t = env(f2, (tzy(pay2),))
        d2t, site2t = pk2t >> ib2, pk2t & ((1 << ib2) - 1)
        d2, coc_x2, pay2s = tzy(d2t), tzy(site2t), tzy(pay2t)
        coc_y2 = pay2s >> 1
        valid2 = (pay2s & 1) > 0
        d2 = jnp.where(valid2, d2, _BIG)

        if Z == 1:
            dist_sq, coc_x, coc_y, valid = d2, coc_x2, coc_y2, valid2
            coc_z = jnp.zeros_like(coc_x)
        else:
            # ---- phase 3: lower envelope along z ------------------------
            d2_z = jnp.moveaxis(d2, 2, 0)  # [Z,X,Y]
            pay3 = (
                (jnp.moveaxis(coc_x2, 2, 0) << 11)
                | (jnp.moveaxis(coc_y2, 2, 0) << 1)
                | jnp.moveaxis(valid2.astype(jnp.int32), 2, 0)
            )
            ib3 = _env_idx_bits(d2_z.shape[0])
            pk3, pay3s = env(d2_z, (pay3,))
            d3, coc_z3 = pk3 >> ib3, pk3 & ((1 << ib3) - 1)
            dist_sq = jnp.moveaxis(d3, 0, 2)
            coc_z = jnp.moveaxis(coc_z3, 0, 2)
            pay3b = jnp.moveaxis(pay3s, 0, 2)
            coc_x = pay3b >> 11
            coc_y = (pay3b >> 1) & ((1 << 10) - 1)
            valid = (pay3b & 1) > 0

    dist_sq = jnp.where(valid, dist_sq, EMPTY_VALUE).astype(jnp.int32)
    inv = jnp.int32(INVALID_COC)
    coc = jnp.stack(
        [
            jnp.where(valid, coc_x, inv),
            jnp.where(valid, coc_y, inv),
            jnp.where(valid, coc_z, inv),
        ],
        axis=-1,
    )
    return {"dist_sq": dist_sq, "coc": coc, "valid": valid}


@partial(jax.jit, static_argnames=("sx", "sy", "max_width", "chunk", "pallas",
                                   "mid", "env_variant", "p1"))
def batch_edt_slab(glb_type, x0, y0, *, sx: int, sy: int, max_width: int,
                   chunk: int = 8, pallas: bool | None = None,
                   mid: bool | None = None, env_variant: str = "base",
                   p1: str = "xla", p1_packed=None):
    """batch_edt restricted to the output slab [x0:x0+sx, y0:y0+sy, :].

    The change-gated merge (models/pipeline.py) recomputes the exact EDT
    only over the slab of voxels this frame's occupancy changes can affect.
    Sites are NEVER restricted — each phase scans a complete site axis —
    only the LANES are sliced, so slab outputs are bit-identical to the
    same voxels of a full batch_edt:

      phase 1 (scan along y)      full canvas        (sites for phase 2)
      phase 2 (envelope along x)  lanes (z, y-slab)  reads all x
      phase 3 (envelope along z)  lanes (x-slab, y-slab)  reads all z

    Phase-2/3 envelope traffic and the downstream merge selects then scale
    with the slab fraction instead of the canvas (VERDICT r2 item 1).

    Args:
      x0, y0: dynamic slab offsets (int32 scalars; caller clamps so the
        slab fits the canvas).  sx, sy: static slab extents.
      p1_packed: optional precomputed packed phase-1 word [X, Y, Z]
        (phase1_packed / the mapper's phase-1 cache, cfg.edt_p1_cache).
        Must equal phase1_packed(glb_type == OCCUPIED) — the caller owns
        that invariant; phase 1 is then skipped entirely and only the
        y-slab of the cache is read.
    Returns {"dist_sq","coc","valid"} shaped [sx, sy, Z] (coc values are
    CANVAS coordinates, exactly as batch_edt returns them).
    """
    occ = glb_type == VOX_OCCUPIED
    X, Y, Z = occ.shape
    if Z <= 1:
        raise ValueError("batch_edt_slab requires a 3-D canvas (Z > 1)")
    if pallas is None:
        pallas = _use_pallas()
    vkw = _env_variant_kwargs(env_variant)
    if pallas:
        from .pallas.envelope import envelope_mid_pallas, envelope_pallas

        env = lambda f, payloads: envelope_pallas(f, payloads,
                                                  packed_out=True, **vkw)
    else:
        env = lambda f, payloads: lower_envelope(f, payloads=payloads,
                                                 chunk=chunk, packed_out=True)
    env_packed = None
    if p1 == "pallas" and pallas:
        from .pallas.phase1 import phase1_fits

        if phase1_fits(Y):
            from .pallas.envelope import envelope_packed_pallas

            env_packed = lambda f, yb: envelope_packed_pallas(
                f, yb, packed_out=True, **vkw)
        else:
            import warnings

            warnings.warn(
                f"edt_phase1='pallas' needs Y <= 1024 (got {Y}); "
                "falling back to the XLA phase 1", stacklevel=2)
    elif p1 != "xla" and p1 != "pallas":
        raise ValueError(f"unknown p1 variant {p1!r}; valid: xla, pallas")

    x0 = jnp.asarray(x0, jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    ysl = lambda a: jax.lax.dynamic_slice(a, (0, y0, 0), (X, sy, Z))
    tzy = lambda a: jnp.transpose(a, (0, 2, 1))

    # ---- phase 1: full canvas; slice the y lanes feeding phase 2 --------
    if p1_packed is not None:
        # caller-maintained cache: phase 1 never runs; read only the y-slab
        from .pallas.phase1 import phase1_pack_bits

        yb = phase1_pack_bits(Y)
        ib2 = _env_idx_bits(X)
        pp = tzy(ysl(p1_packed))                    # [X, Z, sy]
        if env_packed is not None:
            pk2, pay2t = env_packed(pp, yb)
        else:
            # unpack feeds the plain envelope (fuses into its first read):
            # f = g1sq where valid else BIG; payload = (coc_y << 1) | valid
            f2 = jnp.where((pp & 1) > 0, pp >> (yb + 1), _BIG)
            pk2, pay2t = env(f2, (pp & ((1 << (yb + 1)) - 1),))
    elif env_packed is not None:
        from .pallas.phase1 import phase1_pack_bits, phase1_packed_pallas

        yb = phase1_pack_bits(Y)
        packed1 = phase1_packed_pallas(occ, max_width)
        f2p = tzy(ysl(packed1))                     # [X, Z, sy]
        ib2 = _env_idx_bits(X)
        pk2, pay2t = env_packed(f2p, yb)
    else:
        g1, coc_y1, valid1 = _phase1_along_y(occ, max_width)
        g1sq = jnp.where(valid1, g1 * g1, _BIG)
        pay2 = (coc_y1 << 1) | valid1.astype(jnp.int32)
        f2 = tzy(ysl(g1sq))
        ib2 = _env_idx_bits(X)
        pk2, pay2t = env(f2, (tzy(ysl(pay2)),))
    d2t = pk2 >> ib2
    site2t = pk2 & ((1 << ib2) - 1)
    d2m = jnp.where((pay2t & 1) > 0, d2t, _BIG)     # [X, Z, sy]
    pay3 = (site2t << 11) | pay2t

    # ---- phase 3: slice the x lanes; sites = all z -----------------------
    xsl = lambda a: jax.lax.dynamic_slice(a, (x0, 0, 0), (sx, Z, sy))
    d2s = xsl(d2m)
    pay3s = xsl(pay3)
    ib3 = _env_idx_bits(Z)
    if mid and pallas:
        env_mid = lambda f, payloads: envelope_mid_pallas(
            f, payloads, packed_out=True, **vkw)
        pk3, pay3o = env_mid(d2s, (pay3s,))         # [sx, Z, sy]
    else:
        mvz = lambda a: jnp.moveaxis(a, 1, 0)       # [Z, sx, sy]
        pk3z, pay3z = env(mvz(d2s), (mvz(pay3s),))
        pk3 = jnp.moveaxis(pk3z, 0, 1)
        pay3o = jnp.moveaxis(pay3z, 0, 1)
    d3 = pk3 >> ib3
    coc_z3 = pk3 & ((1 << ib3) - 1)

    # ---- slab layout [sx, sy, Z] -----------------------------------------
    t_out = lambda a: jnp.transpose(a, (0, 2, 1))
    dist_sq = t_out(d3)
    coc_z = t_out(coc_z3)
    pay3b = t_out(pay3o)
    coc_x = pay3b >> 11
    coc_y = (pay3b >> 1) & ((1 << 10) - 1)
    valid = (pay3b & 1) > 0

    dist_sq = jnp.where(valid, dist_sq, EMPTY_VALUE).astype(jnp.int32)
    inv = jnp.int32(INVALID_COC)
    coc = jnp.stack(
        [
            jnp.where(valid, coc_x, inv),
            jnp.where(valid, coc_y, inv),
            jnp.where(valid, coc_z, inv),
        ],
        axis=-1,
    )
    return {"dist_sq": dist_sq, "coc": coc, "valid": valid}


def sharded_edt_ok(shape, mesh) -> bool:
    """Whether batch_edt_sharded supports this (shape, mesh)."""
    if mesh is None:
        return False
    X, Y, Z = shape
    n = mesh.size
    return n > 1 and Z > 1 and X % n == 0 and Z % n == 0


@partial(jax.jit, static_argnames=("sy", "max_width", "chunk", "pallas",
                                   "mesh", "env_variant", "p1"))
def batch_edt_sharded_slab(glb_type, y0, *, sy: int, max_width: int, mesh,
                           chunk: int = 8, pallas: bool | None = None,
                           env_variant: str = "base", p1: str = "xla"):
    """batch_edt_sharded restricted to the y-slab [y0:y0+sy] (all x, all z).

    The sharded change-gate slices ONLY the y lanes: x is the mesh-sharded
    axis (slicing it dynamically would fight GSPMD) and z is a site axis.
    Phase 1 runs on the full x-shard; the y-slice happens BEFORE the first
    all_to_all, so both reshards move sy/Y of the bytes; phases 2/3 run on
    (z, y-slab) / (x-shard, y-slab) lanes with complete site axes — slab
    outputs bit-identical to batch_edt_sharded's
    (tests/test_multichip.py::test_sharded_gate_matches_single_device).

    Returns {"dist_sq","coc","valid"} shaped [X, sy, Z], x-sharded."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import MESH_AXIS

    occ = glb_type == VOX_OCCUPIED
    X, Y, Z = occ.shape
    if pallas is None:
        pallas = _use_pallas()
    vkw = _env_variant_kwargs(env_variant)
    if pallas:
        from .pallas.envelope import envelope_pallas

        env = lambda f, payloads: envelope_pallas(f, payloads,
                                                  packed_out=True, **vkw)
    else:
        env = lambda f, payloads: lower_envelope(f, payloads=payloads,
                                                 chunk=chunk, packed_out=True)
    env_packed = None
    if p1 == "pallas" and pallas:
        from .pallas.phase1 import phase1_fits

        if phase1_fits(Y):
            from .pallas.envelope import envelope_packed_pallas

            env_packed = lambda f, yb: envelope_packed_pallas(
                f, yb, packed_out=True, **vkw)

    y0 = jnp.asarray(y0, jnp.int32)

    def body(occ_l, y0_l):
        Xl = occ_l.shape[0]
        a2a = lambda a: jax.lax.all_to_all(a, MESH_AXIS, 1, 0, tiled=True)
        ysl = lambda a: jax.lax.dynamic_slice(a, (0, y0_l[0], 0),
                                              (Xl, sy, Z))
        reshard1 = lambda a: a2a(jnp.transpose(ysl(a), (0, 2, 1)))
        reshard2 = lambda a: a2a(jnp.moveaxis(a, 1, 0))
        packed_c, pay3b, zbits = _edt_zmajor_core(
            occ_l, env, max_width, Z,
            reshard1=reshard1, reshard2=reshard2,
            env_packed=env_packed)
        return packed_c, pay3b

    packed_c, pay3b = jax.shard_map(
        body, mesh=mesh, in_specs=(P(MESH_AXIS), P()),
        out_specs=P(MESH_AXIS), check_vma=False,
    )(occ, jnp.broadcast_to(y0, (1,)))

    zbits = (Z - 1).bit_length() + 1
    dist_sq = packed_c >> (zbits + 1)
    coc_z = (packed_c >> 1) & ((1 << zbits) - 1)
    coc_x = pay3b >> 11
    coc_y = (pay3b >> 1) & ((1 << 10) - 1)
    valid = (packed_c & 1) > 0
    dist_sq = jnp.where(valid, dist_sq, EMPTY_VALUE).astype(jnp.int32)
    inv = jnp.int32(INVALID_COC)
    coc = jnp.stack(
        [
            jnp.where(valid, coc_x, inv),
            jnp.where(valid, coc_y, inv),
            jnp.where(valid, coc_z, inv),
        ],
        axis=-1,
    )
    return {"dist_sq": dist_sq, "coc": coc, "valid": valid}


@partial(jax.jit, static_argnames=("max_width", "chunk", "pallas", "mesh",
                                   "env_variant", "p1"))
def batch_edt_sharded(glb_type, max_width: int, mesh, chunk: int = 8,
                      pallas: bool | None = None, env_variant: str = "base",
                      p1: str = "xla"):
    """batch_edt over a canvas sharded along x on a 1-D device mesh.

    Distributed separable-transform layout (the classic sharded-FFT recipe,
    SURVEY.md §2 P9): every phase scans an axis that is locally complete, and
    the two phase boundaries are explicit `all_to_all` reshards over ICI —
    phase 1 (scan along y) runs on the x-sharded canvas, phase 2 (envelope
    along x) on a z-sharded layout, phase 3 (envelope along z) on an
    x-sharded layout again, which is exactly the canvas sharding the merge
    pipeline needs downstream (no final collective).  Per-device compute is
    the SAME Pallas envelope kernel as the single-chip path (shard_map hands
    it local shards — under plain GSPMD a pallas_call would be replicated),
    and results are bit-identical to batch_edt (tests/test_multichip.py).

    Requires X and Z divisible by mesh.size (sharded_edt_ok); callers fall
    back to batch_edt otherwise.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import MESH_AXIS

    occ = glb_type == VOX_OCCUPIED
    X, Y, Z = occ.shape
    if pallas is None:
        pallas = _use_pallas()
    vkw = _env_variant_kwargs(env_variant)
    if pallas:
        from .pallas.envelope import envelope_pallas

        env = lambda f, payloads: envelope_pallas(f, payloads,
                                                  packed_out=True, **vkw)
    else:
        env = lambda f, payloads: lower_envelope(f, payloads=payloads,
                                                 chunk=chunk, packed_out=True)
    env_packed = None
    if p1 == "pallas" and pallas:
        from .pallas.phase1 import phase1_fits

        if phase1_fits(Y):
            from .pallas.envelope import envelope_packed_pallas

            env_packed = lambda f, yb: envelope_packed_pallas(
                f, yb, packed_out=True, **vkw)
        else:
            import warnings

            warnings.warn(
                f"edt_phase1='pallas' needs Y <= 1024 (got {Y}); "
                "falling back to the XLA phase 1", stacklevel=2)
    elif p1 != "xla" and p1 != "pallas":
        raise ValueError(f"unknown p1 variant {p1!r}; valid: xla, pallas")

    def body(occ_l):
        a2a = lambda a: jax.lax.all_to_all(a, MESH_AXIS, 1, 0, tiled=True)
        packed_c, pay3b, zbits = _edt_zmajor_core(
            occ_l, env, max_width, Z,
            reshard1=lambda a: a2a(jnp.transpose(a, (0, 2, 1))),
            reshard2=lambda a: a2a(jnp.moveaxis(a, 1, 0)),
            env_packed=env_packed)
        return packed_c, pay3b

    # check_vma=False: interpret-mode pallas_call can't annotate its outputs'
    # varying mesh axes (tests run the sharded kernels on the CPU mesh);
    # compiled lowering is unaffected
    packed_c, pay3b = jax.shard_map(
        body, mesh=mesh, in_specs=P(MESH_AXIS), out_specs=P(MESH_AXIS),
        check_vma=False,
    )(occ)

    zbits = (Z - 1).bit_length() + 1
    dist_sq = packed_c >> (zbits + 1)
    coc_z = (packed_c >> 1) & ((1 << zbits) - 1)
    coc_x = pay3b >> 11
    coc_y = (pay3b >> 1) & ((1 << 10) - 1)
    valid = (packed_c & 1) > 0
    dist_sq = jnp.where(valid, dist_sq, EMPTY_VALUE).astype(jnp.int32)
    inv = jnp.int32(INVALID_COC)
    coc = jnp.stack(
        [
            jnp.where(valid, coc_x, inv),
            jnp.where(valid, coc_y, inv),
            jnp.where(valid, coc_z, inv),
        ],
        axis=-1,
    )
    return {"dist_sq": dist_sq, "coc": coc, "valid": valid}
