from .host_mirror import HostMirror
