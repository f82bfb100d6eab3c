"""Golden-value anchors for the flat-sky N1 kernel.

The anchors below were computed by an INDEPENDENT brute-force midpoint quadrature of the
continuum Eq. A.3 integral (arXiv:1807.06210) written directly from the paper (no shared
code or gridding with ops/n1kern: different radial/azimuth grids, continuum spectra
lookups instead of the kernel's integer-snapped ones, full [0, 2pi) azimuths instead of
the kernel's cosine-symmetric half grid; the integrator is preserved in
tests/n1_continuum_integrator.py for regeneration). Richardson convergence between (60, 72)^2 and
(110, 132)^2 point grids is < 2e-5 per anchor, so the anchor values are exact to this
listing's digits; the tolerances cover the kernel's integer-snapped spectrum lookups and
its coarser adaptive grid (measured offsets 0.1 - 6 %, largest where L is small relative
to dL or where the curl integrand nearly cancels).

Inputs are smooth analytic spectra (so integer snapping is a small effect):
    cltt(l) = 1 / (l(l+1) + 1)
    clpp(l) = 1e-2 exp(-((l-30)/30)^2 / 2) / (l(l+1) + 1)
    F(l)    = smooth tanh band window [ ~8, ~52 ] / (cltt + 2e-4)
"""
import numpy as np
import pytest

from plancklens_tpu.ops.n1kern import n1L

LMAX = 60
LPMAX = 120

# (key, L, independent continuum value at (110,132)^2 grid, rtol for the kernel)
ANCHORS = [
    ('p', 20., 6.83970870e+07, 0.10),
    ('p', 40., 1.22880855e+10, 0.01),
    ('s', 30., 3.12454274e+10, 0.01),
    ('x', 30., -2.06451725e+08, 0.05),
]


def _cltt(l):
    return 1. / (l * (l + 1.) + 1.)


def _clpp(l):
    return 1e-2 * np.exp(-0.5 * ((l - 30.) / 30.) ** 2) / (l * (l + 1.) + 1.)


def _F(l):
    win = 0.25 * (1. + np.tanh((l - 8.) / 3.)) * (1. - np.tanh((l - 52.) / 3.))
    return win / (_cltt(np.maximum(l, 1e-3)) + 2e-4)


@pytest.mark.parametrize('key,L,expect,rtol', ANCHORS)
def test_n1_kernel_matches_independent_quadrature(key, L, expect, rtol):
    ls = np.arange(1, LMAX + 1, dtype=float)      # kernel convention: cl[i] = l = i+1
    lp = np.arange(1, LPMAX + 1, dtype=float)
    cltt = _cltt(ls)
    clpp = _clpp(lp)
    ftl = _F(ls)
    zeros = np.zeros(LMAX)
    kA = key + 'tt'
    val = float(n1L(L, kA, kA, 'p', clpp, cltt, zeros, zeros, cltt, zeros, zeros,
                    ftl, zeros, zeros, ftl, zeros, zeros,
                    lminA=1, lminB=1, dL=2, lps=np.arange(1, LPMAX + 1)))
    assert np.isfinite(val)
    assert abs(val / expect - 1.) < rtol, (key, L, val, expect, val / expect - 1.)
