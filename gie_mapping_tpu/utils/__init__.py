from . import constants, geometry
from .config import MapConfig, load_config, load_config_yaml, PRESETS
