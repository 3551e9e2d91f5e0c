"""Pallas TPU kernels for scroll archive I/O: block-row gather/scatter.

The scroll (map_state._do_scroll) moves S thin-slab blocks between the dense
packed canvas [X,Y,Z,3]u32 and the archive rows [B,512,3]u32.  The XLA
formulation pays THREE full-canvas dense<->block-major transposes per scroll
(~3 ms each measured; examples/bench_scroll_bisect.py) to move ~S*6 KB of
actual payload.

These kernels exploit an exact layout identity: archive row b viewed as
[8, 8, 24] (x, y, z*3 row-major) has the same element order as the canvas
tile packed.reshape(X, Y, Z*3)[8bx:8bx+8, 8by:8by+8, 24bz:24bz+24].  Mosaic
requires the last two block dims to be (8,128)-divisible or whole, so the
kernels work in units of (x,y) BLOCK-COLUMNS: one grid step moves the legal
(8, 8, Z*3) canvas tile — the column's full z-extent of cbz blocks — and the
z-split/merge into 24-lane archive rows happens with static in-kernel slices.
All placement logic lives in scalar-prefetched index_maps and 6 KB-contiguous
row DMAs; only the moving columns are touched.

Replaces the reference's per-block D2H streaming memcpys + hash insertions
(src/kernel/par_wave/glb_hash_map.cu:209-247) on the TPU's terms.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import VB_WIDTH

W = VB_WIDTH        # 8
LW = 3 * VB_WIDTH   # 24 lanes: one block's z*payload extent


def _round_up(v, m):
    return (v + m - 1) // m * m


def _col_map(canvas_blocks):
    by = canvas_blocks[1]

    def index_map(i, col_ref, *_):
        # lax.div/rem, not //: jnp's jit-wrapped floor_divide cannot lower
        # inside a TPU index_map (ids are non-negative, so trunc == floor)
        c = col_ref[i]
        return jax.lax.div(c, jnp.int32(by)), jax.lax.rem(c, jnp.int32(by)), 0

    return index_map


def _gather_kernel(cbz, col_ref, src_ref, dst_ref):
    for j in range(cbz):
        dst_ref[j * W:(j + 1) * W, :, :] = src_ref[:, :, j * LW:(j + 1) * LW]


@functools.partial(jax.jit, static_argnames=("canvas_blocks", "interpret"))
def gather_block_rows(packed, col_ids, canvas_blocks, *, interpret: bool = False):
    """Extract whole block-columns of the packed canvas as archive rows.

    Args:
      packed:  uint32 [X, Y, Z, 3] packed canvas (map_state.pack_voxels).
      col_ids: int32 [S] linear (x,y) block-column ids (bx*cby + by); entries
               may repeat or be garbage-in-range (callers pad with 0).

    Returns uint32 [S*cbz, 512, 3]: row k*cbz + j is block (col k, z-block j)
    — bit-identical to
    _dense_to_blocks(packed).reshape(-1, 512, 3)[col_ids[k]*cbz + j].
    """
    X, Y, Z, _ = packed.shape
    cbz = canvas_blocks[2]
    S = col_ids.shape[0]
    cv = packed.reshape(X, Y, Z * 3)

    rows = pl.pallas_call(
        functools.partial(_gather_kernel, cbz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec((W, W, Z * 3), _col_map(canvas_blocks))],
            out_specs=pl.BlockSpec((cbz * W, W, LW), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((S * cbz * W, W, LW), jnp.uint32),
        interpret=interpret,
    )(col_ids, cv)
    return rows.reshape(S * cbz, W ** 3, 3)


def _scatter_kernel(cbz, col_ref, valid_ref, rows_ref, canvas_ref, out_ref):
    i = pl.program_id(0)
    out_ref[...] = canvas_ref[...]
    for j in range(cbz):
        @pl.when(valid_ref[i * cbz + j] != 0)
        def _(j=j):
            out_ref[:, :, j * LW:(j + 1) * LW] = rows_ref[j * W:(j + 1) * W, :, :]


@functools.partial(jax.jit, static_argnames=("canvas_blocks", "interpret"),
                   donate_argnums=(0,))
def scatter_block_rows(packed, rows, col_ids, valid, canvas_blocks,
                       *, interpret: bool = False):
    """Write archive rows into canvas blocks in place, by block-column.

    For column entry k and z-block j (flat index e = k*cbz + j), if
    valid[e] != 0: canvas block (col_ids[k], j) := rows[e].  (Mosaic cannot
    DMA 24-lane slices out of the archive directly — minor dims must be
    128-aligned — so the caller pre-gathers the compact [S*cbz, 512, 3] rows
    with one small XLA row gather and the kernel only places them.)

    Invalid COLUMN entries must carry a parking col_ids[k] distinct from
    every valid target (e.g. any column with no entering block): the kernel
    re-reads that tile and writes it back unchanged, so repeats among
    invalid entries are safe.  Callers should order valid entries first
    (map_state._compact_ids does) so repeated parking tiles coalesce.

    Args:
      packed:  uint32 [X, Y, Z, 3] canvas (donated; updated in place).
      rows:    uint32 [S*cbz, 512, 3] row payload per (column, z-block).
      col_ids: int32 [S] target column id (parking where the column is
               invalid).
      valid:   int32 [S*cbz] 0/1.

    Returns the updated [X, Y, Z, 3] canvas.
    """
    X, Y, Z, _ = packed.shape
    cbz = canvas_blocks[2]
    S = col_ids.shape[0]
    cv = packed.reshape(X, Y, Z * 3)
    rv = rows.reshape(S * cbz * W, W, LW)

    cm = _col_map(canvas_blocks)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, cbz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((cbz * W, W, LW), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((W, W, Z * 3), cm),
            ],
            out_specs=pl.BlockSpec((W, W, Z * 3), cm),
        ),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z * 3), jnp.uint32),
        input_output_aliases={3: 0},  # canvas input (after 2 scalars + rows)
        interpret=interpret,
    )(col_ids, valid, rv, cv)
    return out.reshape(X, Y, Z, 3)


# ---------------------------------------------------------------------------
# archive-row gather/scatter: rows of a_packed [B, 1536] by dynamic index.
# A whole row is 1536 contiguous uint32 = 12 sublanes x 128 lanes, so unlike
# the canvas's 24-lane block slices it IS a legal Mosaic tile — the remaining
# XLA `.at[ids]` row ops on the archive (per-index multi-ms floor, see module
# docstring) become one grid step + 6 KB DMA per row.
# ---------------------------------------------------------------------------

_ROW_SUB = 12   # 512*3 / 128
_ROW_BATCH = 8  # rows per grid step: the one-row-per-step formulation is
# LATENCY-bound (~1.5 µs/step — depthcam's 1.6k-row scroll paid ~2.5 ms in
# serialized 6 KB DMAs, round-5 bisect); issuing _ROW_BATCH manual async
# copies per step and waiting once overlaps them


def _arow_gather_kernel(R, ids_ref, src_ref, out_ref, sem):
    i = pl.program_id(0)
    cps = []
    for j in range(R):
        cp = pltpu.make_async_copy(src_ref.at[ids_ref[i * R + j]],
                                   out_ref.at[j], sem.at[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "row_batch"))
def gather_archive_rows(a_packed, ids, *, interpret: bool = False,
                        row_batch: int | None = None):
    """_rows3(a_packed[ids]) for the flat uint32 [B,1536] archive, int32 ids
    [K] (in-range; callers park invalid entries at any row and mask the
    result).  Returns [K,512,3] rows."""
    B = a_packed.shape[0]
    K = ids.shape[0]
    R = row_batch or _ROW_BATCH
    Kp = _round_up(max(K, 1), R)
    ids_p = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.zeros(Kp - K, jnp.int32)]) \
        if Kp != K else ids.astype(jnp.int32)
    av = a_packed.reshape(B, _ROW_SUB, 128)
    out = pl.pallas_call(
        functools.partial(_arow_gather_kernel, R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Kp // R,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # manual row DMAs
            out_specs=pl.BlockSpec((R, _ROW_SUB, 128),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((R,))],
        ),
        out_shape=jax.ShapeDtypeStruct((Kp, _ROW_SUB, 128), jnp.uint32),
        interpret=interpret,
    )(ids_p, av)
    return out[:K].reshape(K, W ** 3, 3)


def _arow_scatter_kernel(R, ids_ref, valid_ref, rows_ref, arch_ref, out_ref,
                         sem):
    i = pl.program_id(0)
    cps = []
    for j in range(R):
        @pl.when(valid_ref[i * R + j] != 0)
        def _(j=j):
            cp = pltpu.make_async_copy(rows_ref.at[j],
                                       out_ref.at[ids_ref[i * R + j]],
                                       sem.at[j])
            cp.start()
        cps.append(j)
    for j in cps:
        @pl.when(valid_ref[i * R + j] != 0)
        def _(j=j):
            pltpu.make_async_copy(rows_ref.at[j],
                                  out_ref.at[ids_ref[i * R + j]],
                                  sem.at[j]).wait()


@functools.partial(jax.jit, static_argnames=("interpret", "row_batch"),
                   donate_argnums=(0,))
def scatter_archive_rows(a_packed, rows, ids, valid, *,
                         interpret: bool = False,
                         row_batch: int | None = None):
    """a_packed[ids[k]] := rows[k] flattened, in place where valid[k]
    (donated; archive is the flat uint32 [B,1536] layout).

    Invalid entries are simply SKIPPED (their row is never touched — no
    parking, no ordering constraints); valid targets must be unique.  Each
    grid step issues _ROW_BATCH manual VMEM->HBM row copies and waits once,
    so the per-row DMA latency overlaps instead of serializing one grid
    step per row (round-5 finding: the serialized form cost ~1.5 µs/row —
    ~2.5 ms on a depthcam scroll's 1.6k rows).

    Args: a_packed u32 [B,1536]; rows u32 [K,512,3]; ids i32 [K] in-range
    (anything for invalid entries); valid i32 [K] 0/1.
    Returns the updated flat [B,1536] archive.
    """
    B = a_packed.shape[0]
    K = ids.shape[0]
    R = row_batch or _ROW_BATCH
    Kp = _round_up(max(K, 1), R)
    ids_p = ids.astype(jnp.int32)
    val_p = valid.astype(jnp.int32)
    if Kp != K:
        ids_p = jnp.concatenate([ids_p, jnp.zeros(Kp - K, jnp.int32)])
        val_p = jnp.concatenate([val_p, jnp.zeros(Kp - K, jnp.int32)])
        rows = jnp.concatenate(
            [rows, jnp.zeros((Kp - K,) + rows.shape[1:], rows.dtype)])
    av = a_packed.reshape(B, _ROW_SUB, 128)
    rv = rows.reshape(Kp, _ROW_SUB, 128)
    out = pl.pallas_call(
        functools.partial(_arow_scatter_kernel, R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Kp // R,),
            in_specs=[
                pl.BlockSpec((R, _ROW_SUB, 128), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((R,))],
        ),
        out_shape=jax.ShapeDtypeStruct((B, _ROW_SUB, 128), jnp.uint32),
        input_output_aliases={3: 0},  # arch input (after 2 scalars + rows)
        interpret=interpret,
    )(ids_p, val_p, rv, av)
    return out.reshape(B, W ** 3 * 3)


# ---------------------------------------------------------------------------
# Canvas shift: the scroll's dense roll + exposed-fill as ONE kernel pass
# ---------------------------------------------------------------------------

def _shift_kernel(Xb, Yb, L, zl, reanchor, s_ref, defaults_ref, src_ref,
                  out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (W, W, L), 0)
    sub_y = jax.lax.broadcasted_iota(jnp.int32, (W, W, L), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, W, L), 2)
    s0 = s_ref[0] * W                       # voxel shifts (block-aligned)
    s1 = s_ref[1] * W
    xg = i * W + sub + s0                   # source coords of each out voxel
    yg = j * W + sub_y + s1
    valid = ((xg >= 0) & (xg < Xb * W) & (yg >= 0) & (yg < Yb * W)
             & (lane + zl >= 0) & (lane + zl < L))
    blk = src_ref[...]
    if zl != 0:      # static lane rotation, either sign (tpu.dynamic_rotate
        # needs 128-aligned lanes; static slices do not)
        blk = jnp.concatenate([blk[:, :, zl:], blk[:, :, :zl]], axis=2)
    blk = jnp.where(valid, blk, defaults_ref[...])
    if reanchor:
        # fused coc re-anchor (packed-domain): surviving voxels' canvas-
        # relative cocs shift by -s_ref[3:6]*W.  Lane l%3==1 carries
        # (cx | cy<<16), l%3==2 carries cz; the COC_INVALID16 sentinel
        # (0x7FFF) passes through per 16-bit half (a valid coc is within
        # ~1000 voxels of its canvas voxel, so it never equals the
        # sentinel).  Subtraction mod 2^16 == the XLA path's int32-then-
        # cast-to-int16 wraparound.  Exposed lanes just got the defaults
        # pattern (all-sentinel) and pass through; entering archive rows
        # are written after this kernel with their own anchoring.
        lm = jax.lax.rem(lane, jnp.int32(3))
        rx = (s_ref[3] * W).astype(jnp.uint32)
        ry = (s_ref[4] * W).astype(jnp.uint32)
        rz = (s_ref[5] * W).astype(jnp.uint32)
        lo = blk & 0xFFFF
        hi = blk >> 16
        sent = jnp.uint32(0x7FFF)
        lo_delta = jnp.where(lm == 1, rx, rz)
        new_lo = jnp.where(lo == sent, lo, (lo - lo_delta) & 0xFFFF)
        new_hi = jnp.where((lm == 1) & (hi != sent), (hi - ry) & 0xFFFF, hi)
        blk = jnp.where(lm == 0, blk, new_lo | (new_hi << 16))
    out_ref[...] = blk


@functools.partial(jax.jit, static_argnames=("zshift_blk", "interpret"))
def shift_canvas_pallas(cv, defaults, shift_blk, *, zshift_blk: int = 0,
                        reanchor_blk=None, interpret: bool = False):
    """Dense canvas scroll shift in ONE read + ONE write.

    out[x, y, l] = cv[x + 8*sb0, y + 8*sb1, l + 24*zb] where the source is
    in range, else defaults[l] — exactly map_state's shift_nd(packed, ...)
    on the [X, Y, Z*3] view (the wrap values a roll would produce are all
    exposed positions, overwritten by the fill).  The XLA formulation
    materialises one full-canvas pass PER AXIS (three jnp.rolls measure
    ~282 B/voxel with the pack/unpack chain, examples/hlo_scroll_audit.py);
    here the x/y displacement rides the scalar-prefetched index_map (source
    block indices are clamped in range — masked lanes read garbage-but-valid
    tiles) and the z displacement is a STATIC in-VMEM lane rotation
    (tpu.dynamic_rotate rejects the unaligned 3*Z lane extent, so the
    caller dispatches a lax.switch over static zshift_blk arms for the
    common |zb| <= 2 z-scrolls; larger jumps compose this kernel's xy pass
    with one dynamic lane roll — see map_state._do_scroll).

    Args:
      cv: uint32 [X, Y, L] canvas view (packed.reshape(X, Y, Z*3)).
      defaults: uint32 [1, 1, L] per-lane fill (the packed default pattern).
      shift_blk: int32 [3] scroll shift in BLOCK units (voxel shift / 8);
        the z component must equal zshift_blk (static).
      reanchor_blk: optional int32 [3] — when given, surviving voxels'
        packed cocs are re-anchored by -reanchor_blk*8 IN the same pass
        (the scroll's canvas-relative coc fix; see _shift_kernel).  Pass
        the FULL scroll shift here even when the movement's z component is
        handled by a separate composed roll.
    """
    X, Y, L = cv.shape
    Xb, Yb = X // W, Y // W
    zl = 3 * W * zshift_blk
    if not -L < zl < L:
        raise ValueError(f"zshift_blk {zshift_blk} out of range for L={L}")

    reanchor = reanchor_blk is not None
    svec = shift_blk.astype(jnp.int32)
    svec = jnp.concatenate(
        [svec, (reanchor_blk.astype(jnp.int32) if reanchor
                else jnp.zeros(3, jnp.int32))])

    def src_map(i, j, s_ref):
        bi = jnp.maximum(jnp.minimum(i + s_ref[0], Xb - 1), 0)
        bj = jnp.maximum(jnp.minimum(j + s_ref[1], Yb - 1), 0)
        return bi, bj, 0

    return pl.pallas_call(
        functools.partial(_shift_kernel, Xb, Yb, L, zl, reanchor),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Xb, Yb),
            in_specs=[
                pl.BlockSpec((1, 1, L), lambda i, j, s_ref: (0, 0, 0)),
                pl.BlockSpec((W, W, L), src_map),
            ],
            out_specs=pl.BlockSpec((W, W, L), lambda i, j, s_ref: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((X, Y, L), jnp.uint32),
        interpret=interpret,
    )(svec, defaults, cv)
