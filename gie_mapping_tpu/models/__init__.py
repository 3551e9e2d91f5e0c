from .mapper import CapacityWarning, FrameOutput, VolumetricMapper
from .pipeline import merge_frame
