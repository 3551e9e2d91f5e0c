"""Pallas TPU kernel for the projective-raycast panorama lookup.

The free-space carve (ops/raycast.py, pointcloud_project) needs, for every
window voxel v, the min-depth and ray count of its spherical panorama bin:

    vdepth[v] = depth2d[bt[col(v)], vbp[v]]      vcnt[v] = cnt2d[...]

As an XLA gather this is ~300k serialized scalar lookups — measured ~8 ms per
frame on this part (examples/bench_raycast_parts.py), dwarfing the whole rest
of the raycast.  This kernel removes the gather using the window's structure:

* the theta bin depends only on the (x, y) COLUMN (theta = atan2 of the
  horizontal offset), so the theta lookup is one exact one-hot matmul per
  128-column tile on the MXU: A[p, c] = sum_t depthT[p, t] * (bt[c] == t).
  0/1 weights at HIGHEST precision select f32 rows bit-exactly (the f32 ->
  3xbf16 operand split is lossless and only one product per output is
  non-zero).
* the phi bin varies per voxel, but the per-column profile A[:, c] is now
  VMEM-resident, so the phi lookup is a compare-select reduction over the
  NP sublane axis — pure VPU work, no memory traffic.

The panorama (both tables, transposed [NP, NT]) stays resident in VMEM across
all column tiles.  Total HBM traffic: panorama once (~1-4 MB) + the [Z, C]
bin/output planes (~10 MB) — ~50x less than the gathers' effective cost.

Reference semantics: this computes EXACTLY the same values as the XLA gather
formulation (pinned by tests/test_raycast_pallas.py), which itself mirrors the
reference's inverse sensor-model lookup structure (hokuyo/realsense kernels,
src/kernel/scan/*.cu).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS = 128  # columns per tile (lane axis)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _split3_bf16(x):
    """Lossless f32 -> 3x bf16 Dekker split: x == a + b + c exactly in f32
    (each RN step captures >= 8 of the 24 mantissa bits and the residual is
    exactly representable, so the one-hot row select below reconstructs the
    f32 value bit-exactly)."""
    a = x.astype(jnp.bfloat16)
    r1 = x - a.astype(jnp.float32)
    b = r1.astype(jnp.bfloat16)
    c = (r1 - b.astype(jnp.float32)).astype(jnp.bfloat16)
    return a, b, c


def _carve_kernel(nt, np_, zp, depth_ref, cnt_ref, bt_ref, vbp_ref,
                  vd_ref, vc_ref):
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (nt, CS), 0) == bt_ref[0:1, :]
    ).astype(jnp.bfloat16)

    def select(vals):
        # exact 0/1 weights are a single bf16 MXU pass; splitting only the
        # VALUE operand costs 3 passes per table vs HIGHEST f32xf32's 6
        # (the one-hot needs no split), halving the kernel's MXU work while
        # staying bit-exact (one non-zero product per output, f32 accum)
        parts = [
            jax.lax.dot_general(v, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for v in _split3_bf16(vals)
        ]
        return (parts[0] + parts[1]) + parts[2]  # [NP, CS]

    a_d = select(depth_ref[:, :])
    a_c = select(cnt_ref[:, :])
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (np_, CS), 0)
    for z in range(zp):
        m = p_iota == vbp_ref[z:z + 1, :]
        vd_ref[z:z + 1, :] = jnp.sum(jnp.where(m, a_d, 0.0), axis=0,
                                     keepdims=True)
        vc_ref[z:z + 1, :] = jnp.sum(jnp.where(m, a_c, 0.0), axis=0,
                                     keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def panorama_select(depth2d, cnt2d, bt, vbp, *, interpret: bool = False):
    """Vectorised panorama bin lookup.

    Args:
      depth2d: f32 [NT, NP] per-bin min depth.
      cnt2d:   int32 [NT, NP] per-bin ray count.
      bt:      int32 [X, Y] per-column theta bin.
      vbp:     int32 [X, Y, Z] per-voxel phi bin.

    Returns (vdepth f32 [X,Y,Z], vcnt int32 [X,Y,Z]) — bit-identical to
    depth2d[bt[...,None], vbp] / cnt2d[...].

    Precondition (the _split3_bf16 value path): every depth2d/cnt2d value
    must be a NORMAL f32 with |x| <= bf16_max (~3.39e38).  Values above
    bf16_max round to inf and reconstruct as NaN (inf + -inf), and
    f32-subnormal residuals are not representable in bf16.  The raycast's
    inputs satisfy this by construction (depths are metres with a 1e30
    "empty bin" sentinel; counts are small ints) — do NOT switch the empty
    sentinel to FLT_MAX.
    """
    NT, NP = depth2d.shape
    X, Y, Z = vbp.shape
    C = X * Y
    Cp = _round_up(C, CS)
    Zp = _round_up(Z, 8)

    depth_t = depth2d.T  # [NP, NT]
    cnt_t = cnt2d.T.astype(jnp.float32)
    bt_row = jnp.pad(bt.reshape(1, C), ((0, 0), (0, Cp - C)),
                     constant_values=0)
    vbp_zc = jnp.pad(
        vbp.reshape(C, Z).T, ((0, Zp - Z), (0, Cp - C)), constant_values=0
    )  # [Zp, Cp]

    whole = lambda i: (0, 0)
    grid = (Cp // CS,)
    outs = pl.pallas_call(
        functools.partial(_carve_kernel, NT, NP, Zp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NP, NT), whole),
            pl.BlockSpec((NP, NT), whole),
            pl.BlockSpec((1, CS), lambda i: (0, i)),
            pl.BlockSpec((Zp, CS), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((Zp, CS), lambda i: (0, i)),
            pl.BlockSpec((Zp, CS), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Zp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((Zp, Cp), jnp.float32),
        ),
        interpret=interpret,
    )(depth_t, cnt_t, bt_row, vbp_zc)
    vd = outs[0][:Z, :C].T.reshape(X, Y, Z)
    vc = outs[1][:Z, :C].T.reshape(X, Y, Z).astype(jnp.int32)
    return vd, vc
