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
  perfectly regular VPU work — for n ≈ 100..200 that is far below the
  memory-bandwidth roofline and has no serial dependency at all.  The cuTT
  transposes disappear (jnp.moveaxis is free under XLA layout assignment).

The coc is carried exactly as in the reference: phase 1 records the nearest
obstacle's y; each envelope phase records the winning site index and gathers
the upstream coc components through it (local_edt_core.h:116-134,169-192).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.constants import EMPTY_VALUE, INVALID_COC, VOX_OCCUPIED

_BIG = jnp.int32(1 << 28)  # "infinite" squared cost; safe from int32 overflow


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


def lower_envelope(fsq, chunk: int = 8):
    """Exact lower envelope min_i ((x-i)^2 + fsq[i]) along axis 0.

    fsq: int32 [N, ...].  Returns (best [N, ...], argmin-site [N, ...]).
    Ties resolve to the smallest site index (first minimum).

    Single-reduction trick: (cost, site) pairs are packed into one int32 as
    (min(cost, CAP) << idx_bits) | site so value+argmin come from ONE min
    reduce (halves the reduction traffic vs separate min + argmin).  Costs at
    or above CAP saturate — they are 'infinite' alternatives that only win
    when every site is invalid, in which case the caller's validity gather
    marks the result invalid anyway.
    """
    N = fsq.shape[0]
    n_chunks = -(-N // chunk)
    idx_bits = (N - 1).bit_length() if N > 1 else 1
    cap = (1 << (31 - idx_bits)) - 1
    i_idx = jnp.arange(N, dtype=jnp.int32)
    tail_shape = (1,) * (fsq.ndim - 1)
    fsq_c = jnp.minimum(fsq, cap)

    def one_chunk(x_start):
        xs = x_start + jnp.arange(chunk, dtype=jnp.int32)
        dx = xs[:, None] - i_idx[None, :]
        dsq = (dx * dx).reshape((chunk, N) + tail_shape)
        cand = jnp.minimum(dsq + fsq_c[None], cap)
        packed = (cand << idx_bits) | i_idx.reshape((1, N) + tail_shape)
        best = jnp.min(packed, axis=1)
        return best >> idx_bits, best & ((1 << idx_bits) - 1)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    best, arg = jax.lax.map(one_chunk, starts)
    flat = (n_chunks * chunk,) + fsq.shape[1:]
    return best.reshape(flat)[:N], arg.reshape(flat)[:N]


@partial(jax.jit, static_argnames=("max_width", "chunk"))
def batch_edt(glb_type, max_width: int, chunk: int = 8):
    """Batch local EDT over the scrolling window.

    Args:
      glb_type: int8/int32 [X,Y,Z] voxel types; OCCUPIED voxels are sites.
      max_width: X+Y+Z 'infinite' 1-D distance (local_batch.h:46).

    Returns dict with:
      dist_sq: int32 [X,Y,Z] squared Euclidean distance (EMPTY_VALUE where no
               obstacle is reachable in the window — matches the reference's
               "sees nothing" sentinel handling in MarkLimitedObserve,
               unify_helper.cuh:225-231).
      coc:     int32 [X,Y,Z,3] local coordinate of the closest obstacle
               (INVALID_COC triple where invalid).
      valid:   bool [X,Y,Z].
    """
    occ = glb_type == VOX_OCCUPIED
    X, Y, Z = occ.shape

    # ---- phase 1: along y ------------------------------------------------
    g1, coc_y1, valid1 = _phase1_along_y(occ, max_width)
    g1sq = jnp.where(valid1, g1 * g1, _BIG)

    # ---- phase 2: lower envelope along x --------------------------------
    d2, site_x = lower_envelope(g1sq, chunk=chunk)  # [X,Y,Z] each
    coc_x2 = site_x
    coc_y2 = jnp.take_along_axis(coc_y1, site_x, axis=0)
    valid2 = jnp.take_along_axis(valid1, site_x, axis=0)
    d2 = jnp.where(valid2, d2, _BIG)

    if Z == 1:
        dist_sq, coc_x, coc_y, valid = d2, coc_x2, coc_y2, valid2
        coc_z = jnp.zeros_like(coc_x)
    else:
        # ---- phase 3: lower envelope along z ----------------------------
        d2_zfirst = jnp.moveaxis(d2, 2, 0)  # [Z,X,Y]
        d3, site_z = lower_envelope(d2_zfirst, chunk=chunk)
        dist_sq = jnp.moveaxis(d3, 0, 2)
        coc_z = jnp.moveaxis(site_z, 0, 2)
        coc_x = jnp.take_along_axis(coc_x2, coc_z, axis=2)
        coc_y = jnp.take_along_axis(coc_y2, coc_z, axis=2)
        valid = jnp.take_along_axis(valid2, coc_z, axis=2)

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
