"""Exact HEALPix pixel window (ops/sht/pixwin) — geometry invariants, brute-force
per-pixel integrals, the shipped-table/rescale surface, and the healpix-module shim.

Role of healpy's tabulated hp.pixwin (reference usage: plancklens smica DX12 parfile
multiplies the beam by hp.pixwin(2048)); here the window is *computed*, exactly, from
the per-pixel boundary integral."""
import os
import numpy as np
import pytest

from plancklens_tpu.ops.sht.pixwin import (pixwin, pixwin_exact, pixwin_tophat,
                                           _ring_Gm, _ring_shapes, _TABLE_DIR)
from plancklens_tpu.ops.sht.core import legendre_anal
from plancklens_tpu.ops.sht.transforms import _facl


def test_shape_areas_and_total_solid_angle():
    """Every pixel-shape integral at l=m=0 must give exactly Omega_pix, and the
    multiplicity-weighted total must tile the sphere."""
    nside = 8
    omega = 4. * np.pi / (12 * nside ** 2)
    tot = 0.
    for i in range(1, 2 * nside + 1):
        G, theta, mult = _ring_Gm(nside, i, 2, k=12)
        nsh = len(_ring_shapes(nside, i))
        A = np.asarray(legendre_anal(G, 0, theta, 2)) * np.asarray(_facl(2))[:, None]
        areas = np.real(A[:nsh, 0, 0]) * np.sqrt(4. * np.pi)
        np.testing.assert_allclose(areas, omega, rtol=1e-13)
        tot += (2. if i < 2 * nside else 1.) * np.dot(mult, areas)
    np.testing.assert_allclose(tot, 4. * np.pi, rtol=1e-13)


def test_wlm_vs_bruteforce_quadrature():
    """Spot-check the per-shape w_lm against direct 2D quadrature of Y*_lm over the
    pixel (midpoint rule in the HPX projection, scipy spherical harmonics) — covers a
    cap ring, the straddling ring i=nside, and a belt ring."""
    from scipy.special import sph_harm_y
    nside, lmax = 4, 10
    h = np.pi / (4. * nside)

    def brute(i, d, l, m, nq=1600):
        y_c = np.pi / 2. - i * h
        ys = np.linspace(y_c - h, y_c + h, nq + 1)
        ys = 0.5 * (ys[1:] + ys[:-1])
        dy = 2. * h / nq
        cap = ys > np.pi / 4. + 1e-14
        sigma = np.where(cap, 2. - 4. * ys / np.pi, 1.)
        jac = 8. / (3. * np.pi) * np.where(cap, sigma, 1.)
        th = np.arccos(np.clip(np.where(cap, 1. - sigma ** 2 / 3.,
                                        8. * ys / (3. * np.pi)), -1., 1.))
        whw = h - np.abs(ys - y_c)
        phi_hw, phi_c = whw / sigma, d * h / sigma
        F = 2. * phi_hw if m == 0 else 2. * np.sin(m * phi_hw) / m * np.exp(-1j * m * phi_c)
        return np.sum(np.conj(sph_harm_y(l, m, th, 0.)) * F * jac * dy)

    for i in (2, 4, 6):  # cap, straddler (= nside), belt
        G, theta, mult = _ring_Gm(nside, i, lmax, k=12)
        shapes = _ring_shapes(nside, i)
        A = np.asarray(legendre_anal(G, 0, theta, lmax)) * np.asarray(_facl(lmax))[:, None]
        for s, (d, _) in enumerate(shapes):
            for (l, m) in [(3, 0), (5, 2), (8, 5), (10, 7)]:
                bw = brute(i, d, l, m)
                assert abs(A[s, l, m] - bw) <= 2e-6 * max(abs(bw), 1e-10), (i, d, l, m)


def test_pixwin_exact_structure():
    wt, wp = pixwin_exact(8, 32, pol=True)
    assert wt[0] == pytest.approx(1., abs=1e-12)          # normalisation
    assert np.all(np.diff(wt) < 0.)                       # strictly decreasing
    assert np.all((wt > 0.) & (wt <= 1.))
    assert wp[0] == 0. and wp[1] == 0.                    # no pol modes below l=2
    assert np.all((wp[2:] > 0.) & (wp[2:] <= 1.))
    # pol window sits slightly above T (smaller effective smoothing), within ~1%
    r = wp[2:] / wt[2:]
    assert np.all(r > 0.995) and r.max() < 1.02
    # the tophat model is the documented sub-few-percent approximation of the exact one
    th = pixwin_tophat(8, 32)
    assert np.abs(wt[:17] / th[:17] - 1.).max() < 0.025


def test_pixwin_table_and_rescale():
    """The shipped tables obey the 1/nside convergence the nside > 128 path relies on,
    and the Richardson extrapolation it uses beats the plain self-similar rescale
    (healpy's own extrapolation scheme) by ~300x: predicting the exact nside-128
    table from the 32/64 pair lands at <1e-5 where the plain rescale-from-64 leaves
    ~1.7e-3 at l = 4 nside."""
    fn = os.path.join(_TABLE_DIR, 'pixwin_n0128_pol.npy')
    if not os.path.exists(fn):
        pytest.skip('shipped pixwin table not present')
    wt128, wp128 = np.load(fn)
    assert wt128[0] == pytest.approx(1., abs=1e-12) and len(wt128) == 513
    # public nside > 128 path: normalised, monotone, above the finite-nside tables
    wt256, wp256 = pixwin(256, 1024, pol=True)
    assert wt256[0] == pytest.approx(1., abs=1e-6)
    assert np.all(np.diff(wt256) < 1e-12) and np.all(wt256 > 0.4)
    assert wp256[0] == 0. and wp256[1] == 0. and np.all(wp256[2:] > 0.4)
    x = np.arange(513) / 128.           # W grows toward the self-similar limit
    assert np.all(wt256[(x[2:] * 256).astype(int)] > wt128[2:])
    # cross-validation of the extrapolation: predict exact 128 from the 32/64 pair
    from scipy.interpolate import CubicSpline
    wt64 = np.load(os.path.join(_TABLE_DIR, 'pixwin_n0064.npy'))
    wt32 = np.load(os.path.join(_TABLE_DIR, 'pixwin_n0032.npy'))
    xg = np.arange(513) / 128.
    f64 = CubicSpline(np.arange(257) / 64., wt64)(xg)
    f32 = CubicSpline(np.arange(129) / 32., wt32)(xg)
    cx = (f32 - f64) / (1. / 32. - 1. / 64.)
    pred = (f64 - cx / 64.) + cx / 128.
    assert np.abs(pred[1:] / wt128[1:] - 1.).max() < 1e-5
    plain = np.abs(f64[1:] / wt128[1:] - 1.).max()
    assert plain > 1e-3                 # the plain rescale really is 100x worse


def test_healpix_module_shim():
    from plancklens_tpu.ops.sht.healpix import pixwin as hp_pixwin
    a = hp_pixwin(16, 32)
    b = pixwin(16, 32)
    np.testing.assert_array_equal(a, b)
