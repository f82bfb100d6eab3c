"""Gauss-Legendre quadrature nodes and weights.

Replaces the reference OpenMP Fortran kernel `wigners.get_xgwg` (reference:
plancklens/wigners/wigners.f90:132-184, Hale-Townsend style Newton iteration). Here the nodes
are produced host-side in float64 (scipy's O(N) C implementation when available, else a
vectorised Newton iteration on P_N), cached per N, and shipped to device once — the device-side
consumers (Wigner matmuls, SHT analysis) only ever see the cached arrays.
"""
import numpy as np
from functools import lru_cache

try:
    from scipy.special import roots_legendre as _scipy_roots
except Exception:  # pragma: no cover - scipy is expected in this environment
    _scipy_roots = None


def _gauleg_newton(n):
    """Vectorised Newton iteration for the n-point GL rule on (-1, 1), float64."""
    k = np.arange(n, dtype=np.float64)
    # Tricomi-type initial guess, accurate to O(n^-4)
    x = np.cos(np.pi * (k + 0.75) / (n + 0.5))
    for _ in range(100):
        # evaluate P_n and P_{n-1} by upward recursion at all nodes
        p0 = np.ones_like(x)
        p1 = x.copy()
        for l in range(2, n + 1):
            p0, p1 = p1, ((2 * l - 1) * x * p1 - (l - 1) * p0) / l
        dp = n * (x * p1 - p0) / (x * x - 1.0)
        dx = p1 / dp
        x -= dx
        if np.max(np.abs(dx)) < 1e-15:
            break
    # recompute derivative at converged nodes for the weights
    p0 = np.ones_like(x)
    p1 = x.copy()
    for l in range(2, n + 1):
        p0, p1 = p1, ((2 * l - 1) * x * p1 - (l - 1) * p0) / l
    dp = n * (x * p1 - p0) / (x * x - 1.0)
    w = 2.0 / ((1.0 - x * x) * dp * dp)
    return x[::-1].copy(), w[::-1].copy()


@lru_cache(maxsize=64)
def gauleg(n):
    """n-point Gauss-Legendre nodes (ascending in x = cos(theta)) and weights, float64.

    Dispatch: the C++/OpenMP vectorised-Newton kernel when built (plancklens_tpu.native,
    role of reference plancklens/wigners/wigners.f90:132-184 `get_xgwg`; measured 22x
    faster than scipy at N=10,000 single-core AND more accurate — mpmath-verified edge
    weights 9.6e-13 vs scipy's 2.9e-9 relative, docs/PERF.md), else scipy, else the
    pure-numpy Newton iteration."""
    assert n >= 1, n
    from .. import native
    if native.have_native():
        return native.gauleg(n)
    if _scipy_roots is not None:
        x, w = _scipy_roots(n)
        return np.asarray(x, dtype=np.float64), np.asarray(w, dtype=np.float64)
    return _gauleg_newton(n)


def nquad_for(lmaxtot):
    """Number of GL nodes integrating polynomials of degree lmaxtot exactly
    (matches reference: plancklens/utils_spin.py:66)."""
    return (lmaxtot + 2 - lmaxtot % 2) // 2
