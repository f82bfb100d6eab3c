"""Wigner-d kernel correctness: analytic identities, orthogonality, round trips.

These are the golden-value tests the reference lacks (its only test exercises this kernel
indirectly through the N0 = response identity, cf. reference tests/test_w.py).
"""
import numpy as np
import pytest
from scipy.special import eval_legendre

from plancklens_tpu.ops import gauleg as gl
from plancklens_tpu.ops import wigner as wig


def test_gauleg_exactness():
    # n-point GL rule integrates x^k exactly for k <= 2n-1
    for n in [1, 2, 5, 33, 100]:
        x, w = gl.gauleg(n)
        for k in range(0, 2 * n, max(1, (2 * n) // 7)):
            exact = 0. if k % 2 else 2. / (k + 1)
            assert abs(np.sum(w * x ** k) - exact) < 1e-13 * max(1., abs(exact)), (n, k)


def test_gauleg_vs_newton_fallback():
    for n in [3, 50, 257]:
        x1, w1 = gl.gauleg(n)
        x2, w2 = gl._gauleg_newton(n)
        assert np.allclose(x1, x2, atol=1e-13)
        assert np.allclose(w1, w2, atol=1e-13)


def test_dmat_legendre():
    # d^l_{00}(x) = P_l(x)
    x, _ = gl.gauleg(64)
    lmax = 120
    dm = np.asarray(wig.wigner_dmat(lmax, 0, 0, x))
    for l in [0, 1, 2, 7, 64, 120]:
        assert np.allclose(dm[l], eval_legendre(l, x), atol=1e-12), l


def _d1_exact(m1, m2, x):
    # analytic spin-1 d-matrix (Varshalovich tables)
    c, s = x, np.sqrt(1. - x ** 2)
    tab = {(1, 1): (1 + c) / 2, (1, 0): -s / np.sqrt(2.), (1, -1): (1 - c) / 2,
           (0, 0): c}
    if (m1, m2) in tab:
        return tab[(m1, m2)]
    if (m2, m1) in tab:  # d^j_{m1 m2} = (-1)^{m1-m2} d^j_{m2 m1}
        return (-1.) ** (m1 - m2) * tab[(m2, m1)]
    return (-1.) ** (m1 - m2) * _d1_exact(-m1, -m2, x)


def _d2_exact(m1, m2, x):
    c, s = x, np.sqrt(1. - x ** 2)
    tab = {(2, 2): ((1 + c) / 2) ** 2,
           (2, 1): -(1 + c) / 2 * s,
           (2, 0): np.sqrt(3. / 8.) * s ** 2,
           (2, -1): -(1 - c) / 2 * s,
           (2, -2): ((1 - c) / 2) ** 2,
           (1, 1): (1 + c) / 2 * (2 * c - 1),
           (1, 0): -np.sqrt(3. / 8.) * 2 * s * c,
           (1, -1): (1 - c) / 2 * (2 * c + 1),
           (0, 0): (3 * c ** 2 - 1) / 2}
    if (m1, m2) in tab:
        return tab[(m1, m2)]
    if (m2, m1) in tab:
        return (-1.) ** (m1 - m2) * tab[(m2, m1)]
    return (-1.) ** (m1 - m2) * _d2_exact(-m1, -m2, x)


@pytest.mark.parametrize('s1,s2', [(1, 1), (1, 0), (1, -1), (0, 1), (-1, 0), (0, 0), (-1, 1)])
def test_dmat_spin1(s1, s2):
    x, _ = gl.gauleg(40)
    dm = np.asarray(wig.wigner_dmat(3, s1, s2, x))
    assert np.allclose(dm[1], _d1_exact(s1, s2, x), atol=1e-13), (s1, s2)


@pytest.mark.parametrize('s1,s2', [(2, 2), (2, 1), (2, 0), (2, -1), (2, -2), (1, 1),
                                   (1, 0), (1, -1), (0, 0), (0, 2), (-2, 1), (-1, -2)])
def test_dmat_spin2(s1, s2):
    x, _ = gl.gauleg(40)
    dm = np.asarray(wig.wigner_dmat(4, s1, s2, x))
    assert np.allclose(dm[2], _d2_exact(s1, s2, x), atol=1e-13), (s1, s2)


@pytest.mark.parametrize('s1,s2', [(0, 0), (2, 2), (2, -2), (0, 2), (3, 1), (1, -3), (3, -3)])
def test_dmat_orthogonality(s1, s2):
    # int_-1^1 d^l d^l' dx = 2/(2l+1) delta_ll'
    lmax = 50
    x, w = gl.gauleg(lmax + 1)
    dm = np.asarray(wig.wigner_dmat(lmax, s1, s2, x))
    gram = (dm * w) @ dm.T
    expected = np.diag(2. / (2. * np.arange(lmax + 1) + 1.))
    lmin = max(abs(s1), abs(s2))
    expected[:lmin, :lmin] = 0.
    assert np.allclose(gram, expected, atol=1e-12), (s1, s2)


@pytest.mark.parametrize('s1,s2', [(0, 0), (2, 0), (2, 2), (-2, 2), (3, 1), (1, 0), (2, -3)])
def test_pos_coeff_roundtrip(s1, s2):
    # wignercoeff(wg * wignerpos(cl)) == cl for exact GL quadrature
    lmax = 100
    rng = np.random.RandomState(0)
    cl = rng.standard_normal(lmax + 1)
    cl[:max(abs(s1), abs(s2))] = 0.
    npts = gl.nquad_for(2 * lmax)
    x, w = gl.gauleg(npts)
    xi = np.asarray(wig.wignerpos(cl, x, s1, s2))
    clb = np.asarray(wig.wignercoeff(xi * w, x, s1, s2, lmax))
    assert np.allclose(clb, cl, atol=1e-10), (s1, s2)


def test_wignerpos_batched():
    lmax = 40
    x, _ = gl.gauleg(64)
    rng = np.random.RandomState(1)
    cls = rng.standard_normal((5, lmax + 1))
    batched = np.asarray(wig.wignerpos(cls, x, 2, -2))
    for i in range(5):
        assert np.allclose(batched[i], np.asarray(wig.wignerpos(cls[i], x, 2, -2)), atol=1e-13)


def test_wignerc_clpp_identity():
    # wignerc of cl1 x delta-like cl2 with spins 0: convolution of power spectra in the
    # correlation-function sense; check the simplest closure: cl2 = 4pi delta_l0 / (2l+1)...
    # easier: wignerc(cl, one_l0, 0,0,0,0) where one_l0 = [1,0,0...] gives cl/(4pi) smoothed:
    # xi2 = 1/(4pi), so result_l = cl_l /(4 pi) * ... use roundtrip instead:
    lmax = 30
    rng = np.random.RandomState(2)
    cl1 = rng.standard_normal(lmax + 1)
    delta0 = np.zeros(lmax + 1)
    delta0[0] = 1.
    # xi_2(x) = 1/(4pi) constant; product xi1 * 1/(4pi); analysis returns cl1/(4pi)
    out = wig.wignerc(cl1, delta0, 0, 0, 0, 0, lmax_out=lmax)
    assert np.allclose(out, cl1 / (4. * np.pi), atol=1e-12)


def test_wignerc_complex():
    lmax = 30
    rng = np.random.RandomState(3)
    cl1 = rng.standard_normal(lmax + 1) + 1j * rng.standard_normal(lmax + 1)
    cl2 = rng.standard_normal(lmax + 1)
    out = wig.wignerc(cl1, cl2, 2, 0, -2, 0, lmax_out=lmax)
    outr = wig.wignerc(cl1.real, cl2, 2, 0, -2, 0, lmax_out=lmax)
    outi = wig.wignerc(cl1.imag, cl2, 2, 0, -2, 0, lmax_out=lmax)
    assert np.allclose(out.real, outr, atol=1e-12)
    assert np.allclose(out.imag, outi, atol=1e-12)
