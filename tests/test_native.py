"""Native C++/OpenMP kernel layer: parity with the JAX implementations and the
PLK_NATIVE dispatch contract (reference role: plancklens/wigners/wigners.f90 via f2py;
here a ctypes-bound libplkcore.so serving host-side precompute paths)."""
import os

import numpy as np
import pytest

from plancklens_tpu import native
from plancklens_tpu.ops import wigner
from plancklens_tpu.ops.gauleg import gauleg

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason='libplkcore.so not built')


def test_native_gauleg_matches_scipy():
    from scipy.special import roots_legendre
    for n in (1, 2, 7, 64, 257, 1024):
        x, w = native.gauleg(n)
        xr, wr = roots_legendre(n)
        # scipy is the sanity anchor, not truth: its own edge weights are only
        # ~3e-9 relative (mpmath-verified; ours are ~1e-12, docs/PERF.md)
        assert np.allclose(x, xr, atol=5e-15) and np.allclose(w, wr, atol=1e-12)
        assert abs(np.sum(w) - 2.0) < 5e-14
        # truth-based: exact integration of monomials up to degree 2n-1
        for k in {2, 7, min(2 * n - 1, 31)}:
            if k <= 2 * n - 1:
                exact = 0.0 if k % 2 else 2.0 / (k + 1)
                assert abs(np.sum(w * x ** k) - exact) < 5e-14, (n, k)
        # mirror symmetry is exact by construction
        assert np.array_equal(x, -x[::-1]) and np.array_equal(w, w[::-1])


@pytest.mark.parametrize('s1,s2', [(0, 0), (2, 2), (2, -2), (2, 0), (3, 1), (-2, 2)])
def test_native_wigner_matches_jax_interior_and_poles(s1, s2):
    lmax = 40
    rng = np.random.default_rng(3)
    cl = rng.standard_normal(lmax + 1)
    xg, wg = gauleg(48)
    # include the poles, which the scaled-Jacobi prefactor must handle without NaN
    x = np.concatenate([[-1.0], xg, [1.0]])
    xi_nat = native.wignerpos(cl, x, s1, s2)
    xi_jax = np.asarray(wigner.wignerpos(cl, x, s1, s2))
    assert np.all(np.isfinite(xi_nat))
    assert np.allclose(xi_nat, xi_jax, rtol=1e-10, atol=1e-12)
    cl_nat = native.wignercoeff(xi_nat[1:-1] * wg, xg, s1, s2, lmax)
    cl_jax = np.asarray(wigner.wignercoeff(xi_jax[1:-1] * wg, xg, s1, s2, lmax))
    assert np.allclose(cl_nat, cl_jax, rtol=1e-10, atol=1e-12)


def test_plk_native_env_dispatch(monkeypatch):
    """PLK_NATIVE=1 routes 1-D host-numpy wignerpos/wignercoeff through the C++ kernels
    and leaves jax-array and batched inputs on the cached-dmat path."""
    lmax = 16
    cl = np.random.default_rng(0).standard_normal(lmax + 1)
    x, w = gauleg(20)
    ref = np.asarray(wigner.wignerpos(cl, x, 2, 2))
    monkeypatch.setenv('PLK_NATIVE', '1')
    out = wigner.wignerpos(cl, x, 2, 2)
    assert isinstance(out, np.ndarray)  # served natively
    assert np.allclose(out, ref, rtol=1e-10, atol=1e-13)
    clo = wigner.wignercoeff(out * w, x, 2, 2, lmax)
    assert isinstance(clo, np.ndarray)
    assert np.allclose(clo, np.asarray(wigner.wignercoeff(ref * w, x, 2, 2, lmax)),
                       rtol=1e-10, atol=1e-12)
    # batched input: stays on the JAX path (native is 1-D only)
    outb = wigner.wignerpos(np.stack([cl, cl]), x, 2, 2)
    assert not isinstance(outb, np.ndarray)
    assert np.allclose(np.asarray(outb)[0], ref, rtol=1e-10, atol=1e-12)


def test_native_build_module_importable():
    from plancklens_tpu.native import build as bmod
    assert callable(bmod.build)
