"""Pallas TPU kernel for the exact 1-D lower envelope with payload selection.

Computes, along axis 0 of a [N, L] array of squared site costs f:

    best[x, l]  = min_i ((x - i)^2 + f[i, l])
    site[x, l]  = argmin_i (ties -> smallest i)
    pay_k[x, l] = payload_k[site[x, l], l]

This is the hot inner op of the separable EDT (ops/edt_batch.py) — the
TPU-native replacement for the reference's serial Felzenszwalb parabola
stacks (local_edt_core.h:84-193).  The kernel keeps a [N, 128]-lane tile of
sites resident in VMEM and streams x-chunks of [XC, 128] outputs through the
VPU: one fused multiply-add-min per site per output row, zero HBM traffic
beyond one read of f / payloads and one write of the outputs.

Value+argmin ride a single packed int32 key (cost << idx_bits | i), which is
unique per site, so payload selection (a second equality-select pass over the
resident tile) is consistent with the winning site even on cost ties.

Tile sparsity: a per-lane-tile activity mask rides in as a scalar-prefetch
operand; lane tiles whose 128 lines contain no valid site anywhere skip both
reduction loops entirely (`@pl.when`) and emit the invalid sentinel — large
mostly-unobserved canvases (early exploration, depth-camera frustums) pay
only for the observed tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..edt_batch import env_idx_bits

LANES = 128
XC = 64  # output rows per program
SUB = 8  # rows per coarse-to-fine sub-chunk (one int32 vreg of sublanes)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _envelope_kernel(n_sites, idx_bits, n_payloads, n_xc, mono, packed_out,
                     fusepay, cf, packed_yb, active_ref, lo_ref, hi_ref,
                     men_ref, f_hbm, *refs):
    """Site operands stay in HBM; the active branch DMAs one [N,128] lane
    tile into VMEM scratch (once per lane tile — xc==0 runs first), so
    skipped tiles pay neither compute nor fetch.

    Both reduction loops run only over [lo, hi) — indexed PER (lane-tile,
    x-chunk): the host side intersects the tile's occupied site slab with a
    coarse-to-fine radius bound (for every x in this chunk, a site farther
    than the chunk's proven best-cost radius loses strictly — see
    _chunk_bands), so sparse maps cut the O(N^2) loop to a near-linear
    band.  Final batch_edt outputs stay bit-identical: excluded sites lose
    STRICTLY for every sited lane (ties unaffected), and lanes with no
    finite site select an infinite-cost winner whose valid payload bit is 0
    either way, which the caller masks on.

    packed_out: emit the ONE packed reduction word (best << idx_bits | site)
    instead of separate best/site arrays — one fewer full-size HBM write
    here and one fewer read downstream; the caller unpacks with shifts that
    XLA fuses into its next pass.

    fusepay: select payloads inside the min-reduction loop via a running
    argmin (where(packed < acc)) instead of a second equality pass — half
    the loop trips, ~same vector work per trip.  Exact: packed keys are
    unique per site, so the running select picks the same winner; a lane
    with NO valid site in the band may carry payload 0 instead of an
    invalid site's payload, but its valid bit is 0 either way (batch_edt
    masks on it).

    cf (coarse-to-fine): the XC-row chunk splits into XC/SUB sub-chunks of
    SUB rows, each with its OWN [lo, hi) band — indexed
    [(lx * n_xc + xc) * (XC//SUB) + s] — so a sub-chunk 8 rows past the
    last useful site stops immediately instead of riding the whole chunk's
    band.  The host intersects three sound bounds per sub-chunk (see
    _cf_bands): the SUB-granular radius bound, the winner bracket from
    exact coarse winners at chunk boundaries (the envelope argmin is
    non-decreasing in x, ties->smallest included), and the site slab; the
    kernel adds the winner-monotonicity carry (lo of sub-chunk s+1 >= min
    sited-lane winner of s's last row, gated by men_ref exactly like mono).
    Every excluded site loses strictly for every sited lane, so outputs
    stay bit-identical.  This is the two-level transform that stops
    far-from-frustum lanes paying the tile-worst radius: winner POSITIONS
    cluster at the sites, so brackets stay narrow where radii are huge.

    packed_yb: when set, f_hbm holds phase 1's PACKED word
    ((g1sq << yb+1) | (coc_y << 1) | valid — ops/pallas/phase1.py) and there
    is NO separate payload operand: ONE DMA fetches the tile, then a VMEM
    unpack splits f (g1sq where valid else cap — bit-identical to the
    unpacked path's clamp) from the (coc_y << 1 | valid) payload.  Halves
    this kernel's HBM input traffic."""
    n_main = 1 if packed_out else 2
    n_in_pays = 0 if packed_yb is not None else n_payloads
    pay_hbm = refs[:n_in_pays]
    outs_main = refs[n_in_pays: n_in_pays + n_main]
    out_pays = refs[n_in_pays + n_main: n_in_pays + n_main + n_payloads]
    scratch = refs[n_in_pays + n_main + n_payloads:
                   n_in_pays + n_main + n_payloads + 1 + n_payloads]
    carry = refs[-2]
    sem = refs[-1]

    lx = pl.program_id(0)
    xc = pl.program_id(1)
    cap = jnp.int32((1 << (31 - idx_bits)) - 1)
    f_vmem = scratch[0]
    pay_vmem = scratch[1:]

    @pl.when(active_ref[lx] == 0)
    def _():
        # no valid site anywhere in this lane tile: everything is 'infinite'
        if packed_out:  # (cap << idx_bits) | 0 — unpacks to the same pair
            outs_main[0][:, :] = jnp.full((XC, LANES), cap << idx_bits,
                                          jnp.int32)
        else:
            outs_main[0][:, :] = jnp.full((XC, LANES), cap, jnp.int32)
            outs_main[1][:, :] = jnp.zeros((XC, LANES), jnp.int32)
        for k in range(n_payloads):
            out_pays[k][:, :] = jnp.zeros((XC, LANES), jnp.int32)

    @pl.when(active_ref[lx] != 0)
    def _():
        col = pl.ds(lx * LANES, LANES)

        @pl.when(xc == 0)  # first x-chunk of this lane tile: fetch sites
        def _():
            carry[0] = 0
            if packed_yb is not None:
                cp = pltpu.make_async_copy(f_hbm.at[:, col], pay_vmem[0],
                                           sem.at[0])
                cp.start()
                cp.wait()
                p = pay_vmem[0][...]
                f_vmem[...] = jnp.where((p & 1) > 0, p >> (packed_yb + 1),
                                        cap)
                pay_vmem[0][...] = p & ((1 << (packed_yb + 1)) - 1)
            else:
                for j, (src, dst) in enumerate(
                    [(f_hbm, f_vmem)] + list(zip(pay_hbm, pay_vmem))
                ):
                    cp = pltpu.make_async_copy(src.at[:, col], dst, sem.at[j])
                    cp.start()
                    cp.wait()

        # winner-monotonicity carry: the envelope's argmin is non-decreasing
        # in x, so the previous (sub-)chunk's last-row winner (min over lanes
        # whose winner is a real site) lower-bounds every winner in the next
        # — tightening the band's lo from below.  Soundness needs
        # `best < cap` to mean exactly "this lane has a finite site"
        # — i.e. no sited lane's cost may CLAMP to cap — so the host gates
        # the carry (men_ref) on max_finite_f + (Np-1)^2 < cap.
        n_sub = XC // SUB if cf else 1
        width = SUB if cf else XC
        use_carry = mono or cf

        for s in range(n_sub):
            xs = (jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 0)
                  + (xc * XC + s * width))
            init = jnp.full((width, LANES), jnp.int32(0x7FFFFFFF), jnp.int32)
            rows = slice(s * width, (s + 1) * width)

            lo = lo_ref[(lx * n_xc + xc) * n_sub + s]
            if use_carry:
                lo = jnp.maximum(lo, carry[0] * men_ref[0])
            hi = hi_ref[(lx * n_xc + xc) * n_sub + s]

            def body(i, acc, xs=xs):
                fi = f_vmem[i, :].reshape(1, LANES)
                dx = xs - i
                cand = jnp.minimum(dx * dx + jnp.minimum(fi, cap), cap)
                packed = (cand << idx_bits) | i
                return jnp.minimum(acc, packed)

            if fusepay and n_payloads:
                def fused_body(i, accs, xs=xs):
                    acc = accs[0]
                    fi = f_vmem[i, :].reshape(1, LANES)
                    dx = xs - i
                    cand = jnp.minimum(dx * dx + jnp.minimum(fi, cap), cap)
                    packed = (cand << idx_bits) | i
                    better = packed < acc
                    return (jnp.minimum(acc, packed),) + tuple(
                        jnp.where(better, pay_vmem[k][i, :].reshape(1, LANES),
                                  accs[1 + k])
                        for k in range(n_payloads)
                    )

                res = jax.lax.fori_loop(
                    lo, hi, fused_body,
                    (init,) + tuple(jnp.zeros((width, LANES), jnp.int32)
                                    for _ in range(n_payloads)))
                acc, sels = res[0], res[1:]
            else:
                acc = jax.lax.fori_loop(lo, hi, body, init)
                sels = None
            site = acc & ((1 << idx_bits) - 1)
            best = acc >> idx_bits
            if packed_out:
                outs_main[0][rows, :] = acc
            else:
                outs_main[0][rows, :] = best
                outs_main[1][rows, :] = site
            if use_carry:
                last_sited = best[width - 1, :] < cap
                carry[0] = jnp.min(
                    jnp.where(last_sited, site[width - 1, :],
                              jnp.int32(n_sites)))

            if n_payloads:
                if sels is None:
                    inits = tuple(jnp.zeros((width, LANES), jnp.int32)
                                  for _ in range(n_payloads))

                    def pay_body(i, accs, site=site):
                        hit = site == i
                        return tuple(
                            jnp.where(hit,
                                      pay_vmem[k][i, :].reshape(1, LANES),
                                      accs[k])
                            for k in range(n_payloads)
                        )

                    sels = jax.lax.fori_loop(lo, hi, pay_body, inits)
                for k in range(n_payloads):
                    out_pays[k][rows, :] = sels[k]


def _fmin8(fp, N, big):
    """Per-lane 8-block site-cost minima [nb, Lp] + per-lane sited flag [Lp]
    — the ONE full read of f shared by the slab bounds and every band
    helper (act_s/men used to be separate full-canvas reads)."""
    nb = -(-N // 8)
    fpad = jnp.pad(fp, ((0, nb * 8 - N), (0, 0)), constant_values=big)
    fmin8 = jnp.min(fpad.reshape(nb, 8, -1), axis=1)           # [nb, Lp]
    return fmin8, jnp.any(fmin8 < big, axis=0)


def _chunk_bands(fmin8, sited, N, n_tiles, n_chunks, lo, hi, big, width=XC):
    """Per-(x-chunk, lane-tile) site bands [lo2, hi2) that provably contain
    every possible winner (radius bound).

    For each lane, group sites into 8-wide coarse blocks and take the block
    minimum of f (fmin8, computed once by _fmin8).  For chunk c and lane l,
        U[c,l] = min over blocks cb ( maxdx(c,cb)^2 + fmin8[cb,l] )
    upper-bounds the lane's true best cost for EVERY x in the chunk (the
    block term bounds the cost of using that block's min-f site from the
    farthest x).  Any site i with (x-i)^2 > U loses strictly, so the band
    [chunk - r, chunk + r] with r = floor(sqrt(max_sited_lanes U)) + 1 keeps
    results bit-identical for sited lanes while cutting the loop on sparse
    maps.  Lanes with no finite site are excluded from the tile max (their
    outputs are payload-invalid either way).

    width: rows per chunk — XC for the plain kernel, SUB for the
    coarse-to-fine sub-chunk bands (n_chunks scales accordingly)."""
    nb = fmin8.shape[0]
    c_idx = jnp.arange(n_chunks, dtype=jnp.int32)
    cb_idx = jnp.arange(nb, dtype=jnp.int32)
    a = c_idx * width                                          # chunk start
    b = a + (width - 1)                                        # chunk end
    blo = cb_idx * 8
    bhi = jnp.minimum(blo + 7, N - 1)
    maxdx = jnp.maximum(jnp.abs(a[:, None] - bhi[None, :]),
                        jnp.abs(b[:, None] - blo[None, :]))    # [n_chunks, nb]
    # int32-safe: maxdx^2 <= N^2 <= 2^(2*idx_bits) and fmin8 <= cap
    # < 2^(31-idx_bits), whose sum stays < 2^31 for every legal idx_bits
    terms = (maxdx.astype(jnp.int32)[..., None] ** 2
             + jnp.minimum(fmin8, big)[None])               # [n_chunks, nb, Lp]
    U = jnp.min(terms, axis=1)                                 # [n_chunks, Lp]
    U = jnp.where(sited[None, :], U, jnp.int32(-1))
    U_t = jnp.max(U.reshape(n_chunks, n_tiles, LANES), axis=2)  # [n_chunks, tiles]
    # f32 sqrt absolute error << 1 for U < 2^31; the +1 slack absorbs it
    r = (jnp.floor(jnp.sqrt(jnp.maximum(U_t, 0).astype(jnp.float32)))
         .astype(jnp.int32) + 1)
    lo2 = jnp.maximum(lo[None, :], (a[:, None] - r))
    hi2 = jnp.minimum(hi[None, :], (b[:, None] + 1 + r))
    hi2 = jnp.maximum(hi2, lo2)                                # empty stays empty
    # kernel indexes [lx * n_chunks + c]
    return (jnp.transpose(lo2).reshape(-1).astype(jnp.int32),
            jnp.transpose(hi2).reshape(-1).astype(jnp.int32))


def _coarse_winners(fp, N, n_pts, idx_bits, cap):
    """Exact envelope argmin (ties -> smallest site, the kernel's own packed
    tie rule) at the chunk-boundary points x = k*XC, k in [0, n_pts).

    One XLA broadcast-reduce — n_pts <= Np/XC + 1 is tiny, so this pass is
    memory-bound at ~n_pts reads of f.  Returns winner sites [n_pts, Lp]
    (undefined garbage on lanes with no finite site; callers mask)."""
    xs = (jnp.arange(n_pts, dtype=jnp.int32) * XC)[:, None, None]
    i_idx = jnp.arange(N, dtype=jnp.int32)[None, :, None]
    fc = jnp.minimum(fp, cap)[None]                            # [1, N, Lp]
    dx = xs - i_idx
    cand = jnp.minimum(dx * dx + fc, cap)
    packed = (cand << idx_bits) | i_idx
    return jnp.min(packed, axis=1) & ((1 << idx_bits) - 1)     # [n_pts, Lp]


def _cf_bands(fp, fmin8, sited, N, n_tiles, n_xc, lo, hi, big, idx_bits):
    """Coarse-to-fine bands: per-(SUB-row sub-chunk, lane-tile) [lo2, hi2) =
    radius bound @ SUB granularity  ∩  winner bracket @ XC granularity.

    The winner bracket: the envelope's smallest-index argmin m(x) is
    non-decreasing in x (total monotonicity of (x-i)^2 + f[i]; ties ->
    smallest preserved), so for every x in chunk k and every sited lane,
    m(x) in [m(k*XC), m((k+1)*XC)].  Taking min/max over a tile's sited
    lanes gives a sound per-tile bracket whose width tracks the SITE spread
    — not the distance-to-site — so far-from-frustum chunks stop paying
    radius-sized bands.  Exactness: every excluded site loses strictly (or
    ties at a larger index) for every sited lane."""
    nsub = XC // SUB
    lo_u, hi_u = _chunk_bands(fmin8, sited, N, n_tiles, n_xc * nsub, lo, hi,
                              big, width=SUB)           # [tiles * n_xc * nsub]
    w = _coarse_winners(fp, N, n_xc + 1, idx_bits, big)        # [n_xc+1, Lp]
    w_lo = jnp.where(sited[None, :], w, N)
    w_hi = jnp.where(sited[None, :], w, -1)
    w_lo_t = jnp.min(w_lo.reshape(n_xc + 1, n_tiles, LANES), axis=2)
    w_hi_t = jnp.max(w_hi.reshape(n_xc + 1, n_tiles, LANES), axis=2)
    blo = w_lo_t[:-1]                                          # [n_xc, tiles]
    bhi = w_hi_t[1:] + 1
    # broadcast XC-level brackets to the SUB sub-chunks and intersect;
    # kernel index layout: [(lx * n_xc + xc) * nsub + s]
    blo_f = jnp.transpose(blo).reshape(n_tiles * n_xc, 1)
    bhi_f = jnp.transpose(bhi).reshape(n_tiles * n_xc, 1)
    lo2 = jnp.maximum(lo_u.reshape(n_tiles * n_xc, nsub), blo_f)
    hi2 = jnp.minimum(hi_u.reshape(n_tiles * n_xc, nsub), bhi_f)
    hi2 = jnp.maximum(hi2, lo2)
    return lo2.reshape(-1).astype(jnp.int32), hi2.reshape(-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_payloads", "bands", "mono",
                                              "packed_out", "fusepay", "cf",
                                              "packed_yb"))
def _envelope_2d(fsq, payloads, n_payloads: int, bands: bool = True,
                 mono: bool = False, packed_out: bool = False,
                 fusepay: bool = False, cf: bool = False,
                 packed_yb: int | None = None):
    """fsq int32 [N, L]; payloads tuple of int32 [N, L].  With packed_yb,
    fsq holds the phase-1 packed word (payloads must be empty, n_payloads=1:
    the payload is unpacked in-kernel — see _envelope_kernel)."""
    N, L = fsq.shape
    idx_bits = env_idx_bits(N)
    Lp = _round_up(L, LANES)
    Np = _round_up(N, XC)
    cap = (1 << (31 - idx_bits)) - 1
    # packed pad word 0 unpacks to (f=cap, payload-invalid)
    fill = 0 if packed_yb is not None else cap

    fp = jnp.pad(fsq, ((0, 0), (0, Lp - L)), constant_values=fill)
    pp = [jnp.pad(p, ((0, 0), (0, Lp - L))) for p in payloads]
    if packed_yb is not None:  # band prologue reads the unpacked costs
        f_band = jnp.where((fp & 1) > 0, fp >> (packed_yb + 1), cap)
    else:
        f_band = fp

    n_tiles = Lp // LANES
    n_xc = Np // XC
    # ONE full read of f feeds slab bounds + bands: per-lane 8-block minima,
    # reduced to per-(block, tile) sitedness.  The slab is 8-aligned — a
    # sound superset of the exact row bounds: the extra rows hold f == cap,
    # which loses to every finite site (no sited lane in batch_edt's use can
    # clamp to cap: max dx^2 + f ~ 1.4e5 << cap) and carries payload-valid 0
    # for siteless lanes either way.
    fmin8, sited = _fmin8(f_band, N, jnp.int32(cap))
    sited_bt = jnp.any((fmin8 < cap).reshape(-1, n_tiles, LANES), axis=2)
    any_t = jnp.any(sited_bt, axis=0)                          # [tiles]
    active = any_t.astype(jnp.int32)
    nb = fmin8.shape[0]
    lo = jnp.where(any_t, jnp.argmax(sited_bt, axis=0) * 8, 0).astype(jnp.int32)
    hi = jnp.where(
        any_t,
        jnp.minimum((nb - jnp.argmax(sited_bt[::-1], axis=0)) * 8, N),
        0).astype(jnp.int32)
    if cf:
        lo, hi = _cf_bands(f_band, fmin8, sited, N, n_tiles, n_xc, lo, hi,
                           jnp.int32(cap), idx_bits)
    elif bands:
        lo, hi = _chunk_bands(fmin8, sited, N, n_tiles, n_xc, lo, hi,
                              jnp.int32(cap))
    else:  # per-tile slab only (A/B baseline)
        lo = jnp.repeat(lo, n_xc)
        hi = jnp.repeat(hi, n_xc)
    # Mosaic DMA slices must be 8-sublane aligned: pad the SITE axis with
    # invalid rows (every [lo, hi) band stays <= N, so results are unchanged)
    N8 = _round_up(N, 8)
    if N8 != N:
        fp = jnp.pad(fp, ((0, N8 - N), (0, 0)), constant_values=fill)
        pp = [jnp.pad(p, ((0, N8 - N), (0, 0))) for p in pp]

    # mono-carry safety gate: only sound when no sited lane's cost can clamp
    # to cap (see _envelope_kernel); near-cap site costs disable the carry
    # int32-safe: max_finite < cap <= 2^(31-ib) and (Np-1)^2 <= 2^(2*ib),
    # whose sum stays < 2^31 for every legal idx_bits.  Only the mono/cf
    # carry reads it — gating skips a dead full-canvas max on other variants.
    if mono or cf:
        men = ((jnp.max(jnp.where(f_band < cap, f_band, 0))
                + (Np - 1) ** 2) < cap).astype(jnp.int32).reshape(1)
    else:
        men = jnp.zeros(1, jnp.int32)

    grid = (n_tiles, n_xc)
    site_spec = pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM; manual DMA
    out_spec = pl.BlockSpec((XC, LANES), lambda lx, xc, *_: (xc, lx),
                            memory_space=pltpu.VMEM)

    n_in = 1 + (0 if packed_yb is not None else n_payloads)
    n_out = (1 if packed_out else 2) + n_payloads
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[site_spec] * n_in,
        out_specs=tuple([out_spec] * n_out),
        scratch_shapes=[pltpu.VMEM((N8, LANES), jnp.int32)] * (1 + n_payloads)
        + [pltpu.SMEM((1,), jnp.int32),
           pltpu.SemaphoreType.DMA((1 + n_payloads,))],
    )
    outs = pl.pallas_call(
        functools.partial(_envelope_kernel, N, idx_bits, n_payloads, n_xc,
                          mono, packed_out, fusepay, cf, packed_yb),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((Np, Lp), jnp.int32) for _ in range(n_out)
        ),
    )(active, lo, hi, men, fp, *pp)
    return tuple(o[:N, :L] for o in outs)


def _envelope_mid_kernel(n_sites, idx_bits, n_payloads, n_tiles, n_xc, mono,
                         packed_out, fusepay, cf, packed_yb, active_ref,
                         lo_ref, hi_ref, men_ref, f_hbm, *refs):
    """Batched variant of _envelope_kernel: the envelope runs along the
    MIDDLE axis of [B, N, L] inputs (grid dim 0 = batch), so a consumer can
    read a producer's [X, Z, Y] layout directly — the [X,Z,Y]->[Z,X,Y]
    transpose pair between two pallas_calls (which XLA cannot fuse away)
    disappears.  Per-(b, lane-tile) site slabs and per-chunk bands (incl.
    the cf sub-chunk bands) work exactly as in the flat kernel, indexed at
    b*n_tiles + lx.  packed_yb: phase-1 packed input, see _envelope_kernel."""
    n_main = 1 if packed_out else 2
    n_in_pays = 0 if packed_yb is not None else n_payloads
    pay_hbm = refs[:n_in_pays]
    outs_main = refs[n_in_pays: n_in_pays + n_main]
    out_pays = refs[n_in_pays + n_main: n_in_pays + n_main + n_payloads]
    scratch = refs[n_in_pays + n_main + n_payloads:
                   n_in_pays + n_main + n_payloads + 1 + n_payloads]
    carry = refs[-2]
    sem = refs[-1]

    b = pl.program_id(0)
    lx = pl.program_id(1)
    xc = pl.program_id(2)
    tid = b * n_tiles + lx
    cap = jnp.int32((1 << (31 - idx_bits)) - 1)
    f_vmem = scratch[0]
    pay_vmem = scratch[1:]

    @pl.when(active_ref[tid] == 0)
    def _():
        if packed_out:
            outs_main[0][...] = jnp.full((1, XC, LANES), cap << idx_bits,
                                         jnp.int32)
        else:
            outs_main[0][...] = jnp.full((1, XC, LANES), cap, jnp.int32)
            outs_main[1][...] = jnp.zeros((1, XC, LANES), jnp.int32)
        for k in range(n_payloads):
            out_pays[k][...] = jnp.zeros((1, XC, LANES), jnp.int32)

    @pl.when(active_ref[tid] != 0)
    def _():
        col = pl.ds(lx * LANES, LANES)

        @pl.when(xc == 0)  # first x-chunk of this (batch, lane tile)
        def _():
            carry[0] = 0
            if packed_yb is not None:
                cp = pltpu.make_async_copy(f_hbm.at[b, :, col], pay_vmem[0],
                                           sem.at[0])
                cp.start()
                cp.wait()
                p = pay_vmem[0][...]
                f_vmem[...] = jnp.where((p & 1) > 0, p >> (packed_yb + 1),
                                        cap)
                pay_vmem[0][...] = p & ((1 << (packed_yb + 1)) - 1)
            else:
                for j, (src, dst) in enumerate(
                    [(f_hbm, f_vmem)] + list(zip(pay_hbm, pay_vmem))
                ):
                    cp = pltpu.make_async_copy(src.at[b, :, col], dst,
                                               sem.at[j])
                    cp.start()
                    cp.wait()

        n_sub = XC // SUB if cf else 1
        width = SUB if cf else XC

        for s in range(n_sub):
            xs = (jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 0)
                  + (xc * XC + s * width))
            init = jnp.full((width, LANES), jnp.int32(0x7FFFFFFF), jnp.int32)
            rows = slice(s * width, (s + 1) * width)

            def body(i, acc, xs=xs):
                fi = f_vmem[i, :].reshape(1, LANES)
                dx = xs - i
                cand = jnp.minimum(dx * dx + jnp.minimum(fi, cap), cap)
                packed = (cand << idx_bits) | i
                return jnp.minimum(acc, packed)

            lo = lo_ref[(tid * n_xc + xc) * n_sub + s]
            if mono or cf:  # see _envelope_kernel: gated monotonicity carry
                lo = jnp.maximum(lo, carry[0] * men_ref[0])
            hi = hi_ref[(tid * n_xc + xc) * n_sub + s]

            if fusepay and n_payloads:  # see _envelope_kernel
                def fused_body(i, accs, xs=xs):
                    acc = accs[0]
                    fi = f_vmem[i, :].reshape(1, LANES)
                    dx = xs - i
                    cand = jnp.minimum(dx * dx + jnp.minimum(fi, cap), cap)
                    packed = (cand << idx_bits) | i
                    better = packed < acc
                    return (jnp.minimum(acc, packed),) + tuple(
                        jnp.where(better, pay_vmem[k][i, :].reshape(1, LANES),
                                  accs[1 + k])
                        for k in range(n_payloads)
                    )

                res = jax.lax.fori_loop(
                    lo, hi, fused_body,
                    (init,) + tuple(jnp.zeros((width, LANES), jnp.int32)
                                    for _ in range(n_payloads)))
                acc, sels = res[0], res[1:]
            else:
                acc = jax.lax.fori_loop(lo, hi, body, init)
                sels = None
            site = acc & ((1 << idx_bits) - 1)
            best = acc >> idx_bits
            if packed_out:
                outs_main[0][0, rows, :] = acc
            else:
                outs_main[0][0, rows, :] = best
                outs_main[1][0, rows, :] = site
            if mono or cf:
                last_sited = best[width - 1, :] < cap
                carry[0] = jnp.min(
                    jnp.where(last_sited, site[width - 1, :],
                              jnp.int32(n_sites)))

            if n_payloads:
                if sels is None:
                    inits = tuple(jnp.zeros((width, LANES), jnp.int32)
                                  for _ in range(n_payloads))

                    def pay_body(i, accs, site=site):
                        hit = site == i
                        return tuple(
                            jnp.where(hit,
                                      pay_vmem[k][i, :].reshape(1, LANES),
                                      accs[k])
                            for k in range(n_payloads)
                        )

                    sels = jax.lax.fori_loop(lo, hi, pay_body, inits)
                for k in range(n_payloads):
                    out_pays[k][0, rows, :] = sels[k]


def _fmin8_batched(fp, N, big):
    """_fmin8 over a leading batch dim: fp [B, N, Lp] -> (fmin8 [B, nb, Lp],
    sited [B, Lp])."""
    nb = -(-N // 8)
    fpad = jnp.pad(fp, ((0, 0), (0, nb * 8 - N), (0, 0)), constant_values=big)
    fmin8 = jnp.min(fpad.reshape(fp.shape[0], nb, 8, -1), axis=2)
    return fmin8, jnp.any(fmin8 < big, axis=1)


def _chunk_bands_batched(fmin8, sited, N, n_tiles, n_chunks, lo, hi, big,
                         width=XC):
    """Vectorised _chunk_bands over a leading batch dim: fmin8 [B, nb, Lp],
    lo/hi [B, tiles] -> (lo2, hi2) flat [B*tiles*n_chunks] indexed
    (b*n_tiles + lx)*n_chunks + c."""
    B, nb = fmin8.shape[0], fmin8.shape[1]
    c_idx = jnp.arange(n_chunks, dtype=jnp.int32)
    cb_idx = jnp.arange(nb, dtype=jnp.int32)
    a = c_idx * width
    b_end = a + (width - 1)
    blo = cb_idx * 8
    bhi = jnp.minimum(blo + 7, N - 1)
    maxdx = jnp.maximum(jnp.abs(a[:, None] - bhi[None, :]),
                        jnp.abs(b_end[:, None] - blo[None, :]))  # [n_chunks, nb]
    terms = (maxdx.astype(jnp.int32)[None, :, :, None] ** 2
             + jnp.minimum(fmin8, big)[:, None])           # [B,n_chunks,nb,Lp]
    U = jnp.min(terms, axis=2)                                 # [B, n_chunks, Lp]
    U = jnp.where(sited[:, None, :], U, jnp.int32(-1))
    U_t = jnp.max(U.reshape(B, n_chunks, -1, LANES), axis=3)   # [B,n_chunks,tiles]
    r = (jnp.floor(jnp.sqrt(jnp.maximum(U_t, 0).astype(jnp.float32)))
         .astype(jnp.int32) + 1)
    lo2 = jnp.maximum(lo[:, None, :], (a[None, :, None] - r))
    hi2 = jnp.minimum(hi[:, None, :], (b_end[None, :, None] + 1 + r))
    hi2 = jnp.maximum(hi2, lo2)
    # kernel indexes [(b * n_tiles + lx) * n_chunks + c]
    return (jnp.transpose(lo2, (0, 2, 1)).reshape(-1).astype(jnp.int32),
            jnp.transpose(hi2, (0, 2, 1)).reshape(-1).astype(jnp.int32))


def _cf_bands_batched(fp, fmin8, sited, N, n_tiles, n_xc, lo, hi, big,
                      idx_bits):
    """Vectorised _cf_bands over a leading batch dim (see _cf_bands): fp
    [B, N, Lp] -> flat [(b*n_tiles + lx)*n_xc*nsub + xc*nsub + s]."""
    B = fp.shape[0]
    nsub = XC // SUB
    lo_u, hi_u = _chunk_bands_batched(fmin8, sited, N, n_tiles, n_xc * nsub,
                                      lo, hi, big, width=SUB)
    # coarse winners per batch slice (vmapped broadcast-reduce)
    w = jax.vmap(lambda f: _coarse_winners(f, N, n_xc + 1, idx_bits, big))(fp)
    w_lo = jnp.where(sited[:, None, :], w, N)                  # [B, n_xc+1, Lp]
    w_hi = jnp.where(sited[:, None, :], w, -1)
    w_lo_t = jnp.min(w_lo.reshape(B, n_xc + 1, n_tiles, LANES), axis=3)
    w_hi_t = jnp.max(w_hi.reshape(B, n_xc + 1, n_tiles, LANES), axis=3)
    blo = jnp.transpose(w_lo_t[:, :-1], (0, 2, 1))             # [B, tiles, n_xc]
    bhi = jnp.transpose(w_hi_t[:, 1:], (0, 2, 1)) + 1
    lo2 = jnp.maximum(lo_u.reshape(B * n_tiles * n_xc, nsub),
                      blo.reshape(-1, 1))
    hi2 = jnp.minimum(hi_u.reshape(B * n_tiles * n_xc, nsub),
                      bhi.reshape(-1, 1))
    hi2 = jnp.maximum(hi2, lo2)
    return lo2.reshape(-1).astype(jnp.int32), hi2.reshape(-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_payloads", "bands", "mono",
                                              "packed_out", "fusepay", "cf",
                                              "packed_yb"))
def _envelope_mid_3d(f, payloads, n_payloads: int, bands: bool = True,
                     mono: bool = False, packed_out: bool = False,
                     fusepay: bool = False, cf: bool = False,
                     packed_yb: int | None = None):
    """f int32 [B, N, L]; envelope along axis 1; outputs [B, N, L].
    packed_yb: phase-1 packed input (see _envelope_2d)."""
    B, N, L = f.shape
    idx_bits = env_idx_bits(N)
    Lp = _round_up(L, LANES)
    Np = _round_up(N, XC)
    cap = (1 << (31 - idx_bits)) - 1
    fill = 0 if packed_yb is not None else cap

    fp = jnp.pad(f, ((0, 0), (0, 0), (0, Lp - L)), constant_values=fill)
    pp = [jnp.pad(p, ((0, 0), (0, 0), (0, Lp - L))) for p in payloads]
    if packed_yb is not None:
        f_band = jnp.where((fp & 1) > 0, fp >> (packed_yb + 1), cap)
    else:
        f_band = fp

    n_tiles = Lp // LANES
    n_xc = Np // XC
    # shared 8-block-min read (see _envelope_2d: 8-aligned slab superset)
    fmin8, sited = _fmin8_batched(f_band, N, jnp.int32(cap))
    nb = fmin8.shape[1]
    sited_bt = jnp.any((fmin8 < cap).reshape(B, nb, n_tiles, LANES), axis=3)
    any_t = jnp.any(sited_bt, axis=1)                          # [B, tiles]
    active = any_t.astype(jnp.int32).reshape(-1)
    lo = jnp.where(any_t, jnp.argmax(sited_bt, axis=1) * 8, 0
                   ).astype(jnp.int32)
    hi = jnp.where(
        any_t,
        jnp.minimum((nb - jnp.argmax(sited_bt[:, ::-1], axis=1)) * 8, N),
        0).astype(jnp.int32)
    if cf:
        lo, hi = _cf_bands_batched(f_band, fmin8, sited, N, n_tiles, n_xc,
                                   lo, hi, jnp.int32(cap), idx_bits)
    elif bands:
        lo, hi = _chunk_bands_batched(fmin8, sited, N, n_tiles, n_xc, lo, hi,
                                      jnp.int32(cap))
    else:
        lo = jnp.repeat(lo.reshape(-1), n_xc)
        hi = jnp.repeat(hi.reshape(-1), n_xc)
    N8 = _round_up(N, 8)  # Mosaic DMA slices need 8-sublane alignment
    if N8 != N:
        fp = jnp.pad(fp, ((0, 0), (0, N8 - N), (0, 0)), constant_values=fill)
        pp = [jnp.pad(p, ((0, 0), (0, N8 - N), (0, 0))) for p in pp]

    # mono-carry safety gate (see _envelope_kernel); gated: only mono/cf
    # read it, a dead full-canvas max otherwise
    if mono or cf:
        men = ((jnp.max(jnp.where(f_band < cap, f_band, 0))
                + (Np - 1) ** 2) < cap).astype(jnp.int32).reshape(1)
    else:
        men = jnp.zeros(1, jnp.int32)

    grid = (B, n_tiles, n_xc)
    site_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((1, XC, LANES), lambda b, lx, xc, *_: (b, xc, lx),
                            memory_space=pltpu.VMEM)

    n_in = 1 + (0 if packed_yb is not None else n_payloads)
    n_out = (1 if packed_out else 2) + n_payloads
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[site_spec] * n_in,
        out_specs=tuple([out_spec] * n_out),
        scratch_shapes=[pltpu.VMEM((N8, LANES), jnp.int32)] * (1 + n_payloads)
        + [pltpu.SMEM((1,), jnp.int32),
           pltpu.SemaphoreType.DMA((1 + n_payloads,))],
    )
    outs = pl.pallas_call(
        functools.partial(_envelope_mid_kernel, N, idx_bits, n_payloads,
                          n_tiles, n_xc, mono, packed_out, fusepay, cf,
                          packed_yb),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, Np, Lp), jnp.int32) for _ in range(n_out)
        ),
    )(active, lo, hi, men, fp, *pp)
    return tuple(o[:, :N, :L] for o in outs)


def envelope_mid_pallas(fsq, payloads=(), bands: bool = True,
                        mono: bool = False, packed_out: bool = False,
                        fusepay: bool = False, cf: bool = False):
    """(best, site, *payloads) envelope along axis 1 of [B, N, ...]: the
    batched middle-axis variant (outputs keep the input layout).  With
    packed_out, ((best << idx_bits | site), *payloads) instead."""
    shape = fsq.shape
    B, N = shape[0], shape[1]
    L = 1
    for s in shape[2:]:
        L *= s
    res = _envelope_mid_3d(
        fsq.reshape(B, N, L),
        tuple(p.reshape(B, N, L) for p in payloads),
        n_payloads=len(payloads), bands=bands, mono=mono,
        packed_out=packed_out, fusepay=fusepay, cf=cf,
    )
    return tuple(r.reshape(shape) for r in res)


def envelope_packed_pallas(packed, yb: int, bands: bool = True,
                           mono: bool = False, packed_out: bool = False,
                           fusepay: bool = False, cf: bool = False):
    """Envelope over axis 0 of a phase-1 PACKED array [N, ...] (one HBM
    operand carrying both site costs and the (coc_y<<1|valid) payload —
    ops/pallas/phase1.py).  Returns the same
    ((best << idx_bits | site), payload) pair as
    envelope_pallas(f, (pay,), packed_out=True)."""
    shape = packed.shape
    N = shape[0]
    L = 1
    for s in shape[1:]:
        L *= s
    res = _envelope_2d(
        packed.reshape(N, L), (), n_payloads=1, bands=bands, mono=mono,
        packed_out=packed_out, fusepay=fusepay, cf=cf, packed_yb=yb,
    )
    return tuple(r.reshape(shape) for r in res)


def envelope_pallas(fsq, payloads=(), bands: bool = True, mono: bool = False,
                    packed_out: bool = False, fusepay: bool = False,
                    cf: bool = False):
    """Drop-in (best, site, *payloads) envelope over axis 0 of [N, ...].
    With packed_out, ((best << idx_bits | site), *payloads) instead — one
    fewer full-size output (see _envelope_kernel).

    Precondition: a sited lane's true best cost must not clamp to the packing
    cap ((1 << (31 - idx_bits)) - 1): the band slab is an 8-aligned superset
    whose padding rows carry cap-valued sites, so a sited lane whose winner
    ties AT the cap may resolve to a padding row (payload valid=0).
    batch_edt satisfies this by construction (finite costs < N² + input range
    never clamp); direct callers with near-cap costs must pre-clamp below
    cap - (N-1)²."""
    shape = fsq.shape
    N = shape[0]
    L = 1
    for s in shape[1:]:
        L *= s
    res = _envelope_2d(
        fsq.reshape(N, L),
        tuple(p.reshape(N, L) for p in payloads),
        n_payloads=len(payloads), bands=bands, mono=mono,
        packed_out=packed_out, fusepay=fusepay, cf=cf,
    )
    return tuple(r.reshape(shape) for r in res)
