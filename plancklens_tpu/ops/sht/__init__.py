from .geometry import RingGeometry, gl_geometry, ecp_geometry, good_fft_size
from .transforms import SHT
from . import core
