"""CPU mirror of streamed voxel blocks.

Counterpart of the reference's host-side hash map + streamD2H
(/root/reference/src/kernel/par_wave/glb_hash_map.cu:209-247,
 include/par_wave/glb_hash_map.h:33-38): changed blocks are compacted on
device (a boolean block mask instead of thrust sort/unique) and copied to a
host dict for visualization / downstream consumers.  A C++ accelerated mirror
(runtime/native) is used when built; this pure-python dict is the fallback
and the semantic definition.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..map_state import COC_INVALID16, MapState, _dense_to_blocks
from ..utils.config import MapConfig


def _coc_to_global(coc_rel, anchor_vox):
    """int16 relative cocs + int32 anchor -> int32 GLOBAL cocs (the mirror's
    public frame); the COC_INVALID16 sentinel passes through."""
    coc_rel = np.asarray(coc_rel)
    valid = coc_rel[..., :1] != COC_INVALID16
    return np.where(valid, coc_rel.astype(np.int32) + anchor_vox,
                    np.int32(COC_INVALID16))


class HostMirror:
    """Mirror blocks store GLOBAL int32 cocs (converted at ingest from the
    device's canvas-relative / block-relative int16 anchors)."""

    def __init__(self, cfg: MapConfig):
        self.cfg = cfg
        self.blocks: Dict[Tuple[int, int, int], dict] = {}

    def __len__(self):
        return len(self.blocks)

    def ingest(self, changed_blk, origin_blk, state: MapState):
        """Pull all changed canvas blocks device->host, update the mirror."""
        idx = np.argwhere(changed_blk)
        if idx.size == 0:
            return 0
        cb = self.cfg.canvas_blocks
        # one batched row-gather per field (the reference does one small
        # memcpy per block, glb_hash_map.cu:223-229)
        fields = {}
        for name, arr in (("occ_val", state.occ_val), ("vox_type", state.vox_type),
                          ("dist_sq", state.dist_sq), ("coc", state.coc)):
            bv = _dense_to_blocks(arr, cb)
            fields[name] = np.asarray(bv[idx[:, 0], idx[:, 1], idx[:, 2]])
        fields["coc"] = _coc_to_global(
            fields["coc"], np.asarray(origin_blk)[None, :] * 8)
        keys = idx + np.asarray(origin_blk)[None, :]
        for i, key in enumerate(map(tuple, keys)):
            self.blocks[key] = {name: fields[name][i] for name in fields}
        return len(keys)

    def ingest_rows(self, col_ids, col_valid, rows, blk_mask, origin_blk):
        """Merge pre-extracted packed block-column rows (map_state.
        stream_extract) — the async streaming consumer: all device work and
        the D2H copy happened earlier, this is pure host bookkeeping."""
        from ..map_state import np_unpack_voxels

        cb = self.cfg.canvas_blocks
        cbz = cb[2]
        occ, typ, dist, coc = np_unpack_voxels(np.asarray(rows))
        W = 8
        n = 0
        origin = np.asarray(origin_blk)
        for k in np.flatnonzero(np.asarray(col_valid)):
            col = int(col_ids[k])
            bx, by = col // cb[1], col % cb[1]
            for j in np.flatnonzero(np.asarray(blk_mask[k])):
                r = k * cbz + int(j)
                key = (int(origin[0] + bx), int(origin[1] + by),
                       int(origin[2] + j))
                self.blocks[key] = {
                    "occ_val": occ[r].reshape(W, W, W),
                    "vox_type": typ[r].reshape(W, W, W),
                    "dist_sq": dist[r].reshape(W, W, W),
                    # streamed rows carry canvas-relative cocs
                    "coc": _coc_to_global(coc[r].reshape(W, W, W, 3),
                                          origin * 8),
                }
                n += 1
        return n

    def ingest_archive(self, state: MapState):
        """Bulk-import every archived block (checkpoint/shutdown path)."""
        from ..map_state import unpack_voxels

        n = int(state.n_arch)
        if n == 0:
            return 0
        keys = np.asarray(state.arch_keys[:n])
        occ, typ, dist, coc = (np.asarray(a) for a in unpack_voxels(
            state.a_packed[:n].reshape(-1, 512, 3)))
        W = 8
        shp = (n, W, W, W)
        occ, typ, dist = occ.reshape(shp), typ.reshape(shp), dist.reshape(shp)
        coc = coc.reshape(shp + (3,))
        for i, key in enumerate(map(tuple, keys)):
            self.blocks[key] = {
                "occ_val": occ[i], "vox_type": typ[i],
                "dist_sq": dist[i],
                # archive rows anchor cocs to their own block origin
                "coc": _coc_to_global(coc[i], keys[i] * 8),
            }
        return n

    # -- consumers ------------------------------------------------------
    def occupied_cloud(self, voxel_width: float):
        """World positions of all occupied voxels in the mirror
        (publish_glb_2_rviz equivalent, volumetric_mapper.h:246-317)."""
        from ..utils.constants import VOX_OCCUPIED

        pts = []
        for key, blk in self.blocks.items():
            occ = np.argwhere(blk["vox_type"] == VOX_OCCUPIED)
            if occ.size:
                pts.append((np.asarray(key) * 8 + occ) * voxel_width)
        if not pts:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(pts).astype(np.float32)

    def edt_cloud(self, voxel_width: float, z_slice: int | None = None):
        """(position, distance_m) of all voxels with a valid EDT value.

        z_slice: global voxel z of the visualization layer — the reference's
        publish_glb_2_rviz draws the global EDT only at the `vis_height`
        layer unless profiling (volumetric_mapper.h:279-281,339); pass
        round(cfg.vis_height / voxel_width) for that behaviour, None for
        the full cloud (the profiling/RMSE view)."""
        from ..utils.constants import EMPTY_VALUE

        pts, dists = [], []
        for key, blk in self.blocks.items():
            if z_slice is not None:
                kz = z_slice - key[2] * 8
                if not (0 <= kz < 8):
                    continue
            valid = np.argwhere(blk["dist_sq"] < EMPTY_VALUE)
            if z_slice is not None and valid.size:
                valid = valid[valid[:, 2] == z_slice - key[2] * 8]
            if valid.size:
                pts.append((np.asarray(key) * 8 + valid) * voxel_width)
                d = blk["dist_sq"][valid[:, 0], valid[:, 1], valid[:, 2]]
                dists.append(np.sqrt(d.astype(np.float64)) * voxel_width)
        if not pts:
            return np.zeros((0, 3), np.float32), np.zeros((0,), np.float32)
        return (
            np.concatenate(pts).astype(np.float32),
            np.concatenate(dists).astype(np.float32),
        )
