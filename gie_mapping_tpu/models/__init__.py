from .mapper import VolumetricMapper, FrameOutput
from .pipeline import merge_frame
