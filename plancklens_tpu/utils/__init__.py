from . import alm, cls, hashing, cachers, sql, fitsio, maps
from .fitsio import read_alm, write_alm, read_map, write_map, read_cl, write_cl
from .maps import read_map as read_map_spec
from .cls import camb_clfile, cli, clinv, joincls, extcl, cls_dot, cl_inverse
from .hashing import clhash, mchash, hash_check
