"""Native C++/OpenMP kernels (host-side precompute and CPU fallback paths).

Build with `make -C plancklens_tpu/native` (or `python -m plancklens_tpu.native.build`).
Gracefully degrades: `lib` is None when the shared object is absent and callers fall back
to the scipy/JAX implementations (mirroring the reference's optional Fortran loading,
cf. plancklens/wigners/__init__.py).
"""
import ctypes
import os

import numpy as np

_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'libplkcore.so')

lib = None
if os.path.exists(_SO):
    try:
        lib = ctypes.CDLL(_SO)
        _d = ctypes.POINTER(ctypes.c_double)
        lib.plk_gauleg.argtypes = [ctypes.c_int, _d, _d]
        lib.plk_wignerpos.argtypes = [ctypes.c_int, ctypes.c_int, _d, _d,
                                      ctypes.c_int, ctypes.c_int, _d]
        lib.plk_wignercoeff.argtypes = [ctypes.c_int, ctypes.c_int, _d, _d,
                                        ctypes.c_int, ctypes.c_int, _d]
        lib.plk_version.restype = ctypes.c_int
    except OSError:
        lib = None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def have_native():
    return lib is not None


def gauleg(n):
    """Native n-point GL nodes/weights (ascending x)."""
    assert lib is not None, 'libplkcore.so not built'
    x = np.empty(n, dtype=np.float64)
    w = np.empty(n, dtype=np.float64)
    lib.plk_gauleg(n, _ptr(x), _ptr(w))
    return x, w


def wignerpos(cl, x, s1, s2):
    """Native xi(x) = sum_l cl_l (2l+1)/(4pi) d^l_{s1 s2}(x)."""
    assert lib is not None, 'libplkcore.so not built'
    cl = np.ascontiguousarray(cl, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    xi = np.empty(len(x), dtype=np.float64)
    lib.plk_wignerpos(len(x), len(cl) - 1, _ptr(cl), _ptr(x), s1, s2, _ptr(xi))
    return xi


def wignercoeff(xi, x, s1, s2, lmax):
    """Native cl_l = 2 pi sum_i xi_i d^l_{s1 s2}(x_i)."""
    assert lib is not None, 'libplkcore.so not built'
    xi = np.ascontiguousarray(xi, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    cl = np.empty(lmax + 1, dtype=np.float64)
    lib.plk_wignercoeff(len(x), lmax, _ptr(xi), _ptr(x), s1, s2, _ptr(cl))
    return cl
