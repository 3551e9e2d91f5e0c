import numpy as np

from gie_mapping_tpu.models.mapper import VolumetricMapper
from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
from gie_mapping_tpu.runtime.viz import export_frame, export_global, write_ply
from gie_mapping_tpu.utils.config import scan2d_config


def test_ply_export(tmp_path):
    cfg = scan2d_config(local_size_m=(4.0, 4.0, 1.2), voxel_width=0.2,
                        max_blocks=2048, display_glb_edt=True,
                        display_glb_ogm=True)
    world = BoxWorld.corridor(seed=3, n_pillars=3, extent=2.5)
    mapper = VolumetricMapper(cfg)
    proj = circular_trajectory(1, radius=0.5)[0]
    r, tmin, tinc = world.scan_2d(proj, n_beams=360)
    out = mapper.process_scan2d(proj, r, tmin, tinc)

    n1, n2 = export_frame(out, cfg.voxel_width, str(tmp_path / "f0"))
    assert n1 > 0 and n2 > 0
    header = open(tmp_path / "f0_edt.ply").read(200)
    assert header.startswith("ply") and "property float distance" in header

    mapper.flush_stream()  # streaming is async two-phase; ingest before export
    g1, g2 = export_global(mapper.mirror, cfg.voxel_width, str(tmp_path / "f0"))
    assert g1 > 0 and g2 > 0
