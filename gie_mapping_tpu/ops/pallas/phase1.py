"""Pallas TPU kernel for EDT phase 1 (1-D distance along y) with packed output.

TPU-native replacement for the XLA `lax.cummax`/`lax.cummin` formulation in
ops/edt_batch.py::_phase1_along_y (itself the redesign of the reference's two
serial per-column passes, /root/reference/src/kernel/edt/local_edt_core.h:14-82):
XLA lowers each cumulative scan to a full-width `reduce_window`, which the TPU
backend rewrites into a logarithmic cascade of full-canvas HBM passes — on the
depthcam-class canvas that is the EDT's single largest traffic term.  Here the
whole scan runs INSIDE one kernel over a resident [XB, Y, 128] VMEM block
(Hillis-Steele shifted max/min, log2(Y) steps of pure VMEM work), so HBM sees
exactly one read of the occupancy and one write of the result.

The result is ONE packed int32 per voxel,

    packed = valid ? (g1sq << (yb+1)) | (coc_y << 1) | 1 : 0,   yb = bits(Y-1)

i.e. phase 2's site costs AND its payload ride a single array: half the
phase-1 write traffic, half the phase-2 read traffic, and — decisively for the
sharded EDT — half the bytes through the phase-boundary transpose/all_to_all
reshard.  The envelope kernels unpack it in VMEM (ops/pallas/envelope.py,
packed_yb), so the f = g1sq-where-valid-else-cap semantics stay bit-identical
to the unpacked path (g1sq <= (Y-1)^2 < 2^(2*yb) always fits: valid implies a
site exists in the column, so the 1-D distance is at most Y-1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 128
XB = 8  # x rows per program: one [XB, y, 128] vreg slab per scan step


def phase1_fits(Y: int) -> bool:
    """True iff the packed word has room: g1sq needs 2*yb bits, coc_y yb,
    valid 1 (Y <= 1024).  batch_edt falls back to the XLA phase 1 when
    False — the packed scan is a performance default, not a capability."""
    yb = (Y - 1).bit_length() if Y > 1 else 1
    return 3 * yb + 1 <= 31


def phase1_pack_bits(Y: int) -> int:
    """yb such that packed = (g1sq << (yb+1)) | (coc_y << 1) | valid; the
    single source of truth shared with the envelope unpack (packed_yb)."""
    yb = (Y - 1).bit_length() if Y > 1 else 1
    if 3 * yb + 1 > 31:  # g1sq needs 2*yb bits, coc_y yb bits, valid 1
        raise ValueError(f"phase-1 packing needs Y <= 1024, got {Y}")
    return yb


def _phase1_kernel(Y, yb, max_width, occ_ref, out_ref):
    occ = occ_ref[...] != 0                       # [XB, Y, LANES]
    y_iota = jax.lax.broadcasted_iota(jnp.int32, (XB, Y, LANES), 1)
    big = jnp.int32(1 << 29)

    # last occupied index at-or-below y: Hillis-Steele inclusive max scan
    a = jnp.where(occ, y_iota, jnp.int32(-1))
    sh = 1
    while sh < Y:
        pad = jnp.full((XB, sh, LANES), -1, jnp.int32)
        a = jnp.maximum(a, jnp.concatenate([pad, a[:, : Y - sh, :]], axis=1))
        sh *= 2
    # first occupied index at-or-above y: reverse min scan
    b = jnp.where(occ, y_iota, big)
    sh = 1
    while sh < Y:
        pad = jnp.full((XB, sh, LANES), big, jnp.int32)
        b = jnp.minimum(b, jnp.concatenate([b[:, sh:, :], pad], axis=1))
        sh *= 2

    mw = jnp.int32(max_width)
    d_fwd = jnp.where(a >= 0, y_iota - a, mw)
    d_bwd = jnp.where(b < big, b - y_iota, mw)
    g1 = jnp.minimum(jnp.minimum(d_fwd, d_bwd), mw)
    valid = g1 < mw
    # tie at equal distance -> the forward (lower-y) obstacle, matching
    # _phase1_along_y's `d_fwd <= d_bwd` (local_edt_core.h:69 strict `<`)
    coc = jnp.where(d_fwd <= d_bwd, a, b)
    g1c = jnp.where(valid, g1, 0)                 # keep the shift overflow-free
    cocc = jnp.where(valid, coc, 0)
    out_ref[...] = jnp.where(
        valid, ((g1c * g1c) << (yb + 1)) | (cocc << 1) | 1, 0
    )


@functools.partial(jax.jit, static_argnames=("max_width", "interpret"))
def phase1_packed_pallas(occ, max_width: int, *, interpret: bool = False):
    """occ int8/bool/int32 [X, Y, Z] (nonzero = obstacle site) -> packed int32
    [X, Y, Z] (see module docstring).  Scan axis is axis 1.

    The kernel takes int32 (the XLA-side widen is one fused elementwise pass;
    an int8 block trips a Mosaic i1-relayout bug: compare on (32,128)-tiled
    i8 yields an i1 vector Mosaic can't relayout to (8,128))."""
    X, Y, Z = occ.shape
    yb = phase1_pack_bits(Y)
    if occ.dtype != jnp.int32:
        occ = occ.astype(jnp.int32)
    grid = (pl.cdiv(X, XB), pl.cdiv(Z, LANES))
    kw = {"interpret": True} if interpret else {}  # keep the kwarg absent so
    # test fixtures that setdefault interpret=True on pl.pallas_call apply
    return pl.pallas_call(
        functools.partial(_phase1_kernel, Y, yb, max_width),
        grid=grid,
        in_specs=[pl.BlockSpec((XB, Y, LANES), lambda i, j: (i, 0, j))],
        out_specs=pl.BlockSpec((XB, Y, LANES), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.int32),
        **kw,
    )(occ)
