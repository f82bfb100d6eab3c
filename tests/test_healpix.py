"""HEALPix-grid SHT: synthesis against brute-force sums, analysis round trip at
quadrature accuracy (ring weights / equal-area) and with Jacobi refinement (iter>0)."""
import numpy as np
import pytest

from plancklens_tpu.ops.sht.healpix import HealpixGeometry, HealpixSHT
from plancklens_tpu.ops import wigner as wig
from plancklens_tpu.utils import alm as ualm

NSIDE = 16
LMAX = 2 * NSIDE


def _random_alm(lmax, seed=0, lmin=0):
    rng = np.random.RandomState(seed)
    ls, ms = ualm._lm_indices(lmax)
    a = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))) / np.sqrt(2.)
    a[ms == 0] = a[ms == 0].real * np.sqrt(2.)
    a[ls < lmin] = 0.
    return a


def test_geometry():
    g = HealpixGeometry(NSIDE)
    assert g.npix == 12 * NSIDE ** 2
    assert g.nrings == 4 * NSIDE - 1
    assert np.sum(g.nphi) == g.npix
    # ring z values are symmetric and decreasing
    z = np.cos(g.theta)
    assert np.all(np.diff(z) < 0)
    assert np.allclose(z, -z[::-1])


def test_alm2map_vs_bruteforce():
    g = HealpixGeometry(NSIDE)
    sht = HealpixSHT(NSIDE, LMAX)
    tlm = _random_alm(LMAX, 1)
    f = np.asarray(sht.alm2map(tlm))
    # brute force at a few rings (one cap, one equatorial)
    fac = np.sqrt((2 * np.arange(LMAX + 1) + 1) / (4 * np.pi))
    for ring in [2, 2 * NSIDE, 4 * NSIDE - 4]:
        x = np.array([np.cos(g.theta[ring])])
        npr = g.nphi[ring]
        phis = g.phi0[ring] + 2 * np.pi * np.arange(npr) / npr
        fb = np.zeros(npr)
        for m in range(0, LMAX + 1):
            dm = np.asarray(wig.wigner_dmat(LMAX, m, 0, x))[:, 0]
            Fm = np.sum(tlm[ualm.getidx(LMAX, np.arange(m, LMAX + 1), m)]
                        * (fac * dm)[m:])
            fb += (2. - (m == 0)) * np.real(Fm * np.exp(1j * m * phis))
        got = f[g.ofs[ring]:g.ofs[ring] + npr]
        assert np.abs(got - fb).max() < 1e-10 * max(1., np.abs(fb).max()), ring


def test_roundtrip_quadrature_accuracy():
    # equal-area quadrature: approximate inverse; band-limited input at lmax <~ nside
    # round-trips at the sub-percent level (healpy iter=0 behaviour)
    lmax = NSIDE
    sht = HealpixSHT(NSIDE, lmax)
    tlm = _random_alm(lmax, 2)
    back = np.asarray(sht.map2alm(sht.alm2map(tlm)))
    err = np.abs(back - tlm).max() / np.abs(tlm).max()
    assert err < 0.05, err


def test_ring_weights_and_iter_refinement():
    lmax = NSIDE
    tlm = _random_alm(lmax, 2)
    sht_ea = HealpixSHT(NSIDE, lmax, use_ring_weights=False)
    sht_rw = HealpixSHT(NSIDE, lmax)
    m = sht_rw.alm2map(tlm)

    def err(back):
        return np.abs(np.asarray(back) - tlm).max() / np.abs(tlm).max()
    e_ea, e_rw = err(sht_ea.map2alm(m)), err(sht_rw.map2alm(m))
    assert e_rw < 0.3 * e_ea, (e_rw, e_ea)   # ring weights beat equal-area
    assert err(sht_rw.map2alm(m, iter=1)) < 1e-5
    assert err(sht_rw.map2alm(m, iter=3)) < 1e-10
    # spin-2 refinement
    glm = _random_alm(lmax, 3, lmin=2)
    clm = _random_alm(lmax, 4, lmin=2)
    q, u = sht_rw.alm2map_spin((glm, clm), 2)
    gb, cb = sht_rw.map2alm_spin((q, u), 2, iter=3)
    assert np.abs(np.asarray(gb) - glm).max() / np.abs(glm).max() < 1e-10
    assert np.abs(np.asarray(cb) - clm).max() / np.abs(clm).max() < 1e-10


def test_spin2_roundtrip_consistency():
    lmax = NSIDE
    sht = HealpixSHT(NSIDE, lmax)
    glm = _random_alm(lmax, 3, lmin=2)
    clm = _random_alm(lmax, 4, lmin=2)
    q, u = sht.alm2map_spin((glm, clm), 2)
    gb, cb = sht.map2alm_spin((np.asarray(q), np.asarray(u)), 2)
    err_g = np.abs(np.asarray(gb) - glm).max() / np.abs(glm).max()
    err_c = np.abs(np.asarray(cb) - clm).max() / np.abs(clm).max()
    assert err_g < 0.05, err_g
    assert err_c < 0.05, err_c
