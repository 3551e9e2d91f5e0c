from .edt_batch import batch_edt, lower_envelope
from .raycast import pointcloud_project, pointcloud_raycast, panorama_bins
from .scan_sensors import (
    CamParam,
    MulScanParam,
    ScanParam,
    hokuyo_update,
    realsense_update,
    vlp16_update,
)
from .wave import mark_frontiers, reconcile_window, relax_fixed_point
