"""SHT engine golden-value tests: scipy spherical harmonics (spin 0), brute-force
Wigner-d sums (spin s), round trips, Parseval, and batch consistency."""
import numpy as np
import pytest
from scipy.special import sph_harm_y

from plancklens_tpu.ops.sht import SHT, gl_geometry
from plancklens_tpu.ops import wigner as wig
from plancklens_tpu.utils import alm as ualm

LMAX = 24


def _random_alm(lmax, seed=0):
    rng = np.random.RandomState(seed)
    sz = ualm.getsize(lmax)
    a = (rng.standard_normal(sz) + 1j * rng.standard_normal(sz)) / np.sqrt(2.)
    a[:lmax + 1] = a[:lmax + 1].real * np.sqrt(2.)
    return a


def _brute_synth_spin(glm, clm, spin, lmax, geom):
    """Direct sum _sf = sum_lm _sa_lm sqrt((2l+1)/4pi) d^l_{m,-s} e^{im phi}."""
    th = geom.theta
    phi = geom.phi0 + 2 * np.pi * np.arange(geom.nphi) / geom.nphi
    x = np.cos(th)
    f = np.zeros((geom.nrings, geom.nphi), dtype=complex)
    for m in range(-lmax, lmax + 1):
        am = np.zeros(lmax + 1, dtype=complex)
        for l in range(abs(m), lmax + 1):
            if m >= 0:
                g, c = glm[ualm.getidx(lmax, l, m)], clm[ualm.getidx(lmax, l, m)]
            else:
                g = (-1) ** m * np.conj(glm[ualm.getidx(lmax, l, -m)])
                c = (-1) ** m * np.conj(clm[ualm.getidx(lmax, l, -m)])
            am[l] = -(g + 1j * c) if spin >= 0 else 0.
            if spin == 0:
                am[l] = g  # healpy scalar convention: map = sum t Y
        # theta part: sum_l am_l sqrt((2l+1)/4pi) d^l_{m,-spin}(x)
        dm = np.asarray(wig.wigner_dmat(lmax, m, -spin, x))
        fac = np.sqrt((2 * np.arange(lmax + 1) + 1) / (4 * np.pi))
        Fm = (am * fac) @ dm
        f += Fm[:, None] * np.exp(1j * m * phi)[None, :]
    return f


def test_alm2map_vs_scipy():
    geom = gl_geometry(LMAX)
    sht = SHT(geom, LMAX)
    tlm = _random_alm(LMAX)
    f = np.asarray(sht.alm2map(tlm))
    # brute force with scipy spherical harmonics
    th = geom.theta
    phi = 2 * np.pi * np.arange(geom.nphi) / geom.nphi
    TH, PH = np.meshgrid(th, phi, indexing='ij')
    fb = np.zeros_like(f[0] if f.ndim == 3 else f)
    fb = np.zeros((geom.nrings, geom.nphi))
    for l in range(LMAX + 1):
        for m in range(0, l + 1):
            Y = sph_harm_y(l, m, TH, PH)
            alm = tlm[ualm.getidx(LMAX, l, m)]
            fb += (alm * Y).real * (1 if m == 0 else 2)
    assert np.abs(f - fb).max() < 1e-10 * np.abs(fb).max()


def test_map2alm_roundtrip_spin0():
    sht = SHT(LMAX)
    tlm = _random_alm(LMAX)
    back = np.asarray(sht.map2alm(sht.alm2map(tlm)))
    assert np.abs(back - tlm).max() < 1e-11


@pytest.mark.parametrize('spin', [1, 2, 3])
def test_alm2map_spin_vs_bruteforce(spin):
    geom = gl_geometry(LMAX)
    sht = SHT(geom, LMAX)
    glm, clm = _random_alm(LMAX, 1), _random_alm(LMAX, 2)
    for a in (glm, clm):
        a[:spin] = 0.
        for m in range(1, LMAX + 1):  # zero l < spin rows
            for l in range(m, min(spin, LMAX + 1)):
                a[ualm.getidx(LMAX, l, m)] = 0.
    m1, m2 = sht.alm2map_spin((glm, clm), spin)
    f = np.asarray(m1) + 1j * np.asarray(m2)
    fb = _brute_synth_spin(glm, clm, spin, LMAX, geom)
    assert np.abs(f - fb).max() < 1e-10 * np.abs(fb).max(), spin


@pytest.mark.parametrize('spin', [1, 2, 3])
def test_spin_roundtrip(spin):
    sht = SHT(LMAX)
    glm, clm = _random_alm(LMAX, 3), _random_alm(LMAX, 4)
    lmin = spin
    # zero the l < spin multipoles (not representable at spin s)
    ls, ms = ualm._lm_indices(LMAX)
    glm[ls < lmin] = 0.
    clm[ls < lmin] = 0.
    maps = sht.alm2map_spin((glm, clm), spin)
    gb, cb = sht.map2alm_spin(maps, spin)
    assert np.abs(np.asarray(gb) - glm).max() < 1e-11, spin
    assert np.abs(np.asarray(cb) - clm).max() < 1e-11, spin


def test_parseval_spin0():
    sht = SHT(LMAX)
    tlm = _random_alm(LMAX, 5)
    f = np.asarray(sht.alm2map(tlm))
    geom = sht.geom
    # int |f|^2 dOmega = sum_lm |a_lm|^2 (m<0 included)
    integral = np.sum(f ** 2 * geom.weight[:, None]) * (2 * np.pi / geom.nphi)
    ls, ms = ualm._lm_indices(LMAX)
    w = np.where(ms == 0, 1., 2.)
    assert np.isclose(integral, np.sum(w * np.abs(tlm) ** 2), rtol=1e-12)


def test_batched_transforms():
    sht = SHT(LMAX)
    tlms = np.stack([_random_alm(LMAX, s) for s in range(4)])
    f = np.asarray(sht.alm2map(tlms))
    assert f.shape == (4, sht.geom.nrings, sht.geom.nphi)
    for i in range(4):
        assert np.allclose(f[i], np.asarray(sht.alm2map(tlms[i])), atol=1e-12)


def test_high_m_underflow_recovery():
    # seeds underflow unscaled arithmetic when m log(sin theta/2) is very negative;
    # the scaled recursion must still recover values at l >> m. Use a single large-m mode
    # and check against the brute-force Wigner evaluation on the polar-most ring.
    lmax = 300
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    tlm = np.zeros(ualm.getsize(lmax), dtype=complex)
    m_hi = 250
    tlm[ualm.getidx(lmax, lmax, m_hi)] = 1. + 0.j
    f = np.asarray(sht.alm2map(tlm))
    th0 = geom.theta[0]
    dm = np.asarray(wig.wigner_dmat(lmax, m_hi, 0, np.array([np.cos(th0)])))
    fac = np.sqrt((2 * lmax + 1) / (4 * np.pi))
    expected_ring0 = 2 * (dm[lmax, 0] * fac
                          * np.cos(m_hi * 2 * np.pi * np.arange(geom.nphi) / geom.nphi))
    assert np.abs(f[0] - expected_ring0).max() < 1e-10
    back = np.asarray(sht.map2alm(f))
    assert np.abs(back - tlm).max() < 1e-10


def test_aliased_synthesis_exact_pointwise():
    # nphi far below 2 lmax + 1: synthesis folds m mod nphi and must stay exact at the
    # grid points (deflection fields at lmax_unl are evaluated on lmax output grids)
    from plancklens_tpu.ops.sht.geometry import ecp_geometry
    from plancklens_tpu.ops import wigner as wig
    lmax = 48
    rng = np.random.RandomState(0)
    ls, ms = ualm._lm_indices(lmax)
    a = rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))
    a[ms == 0] = a[ms == 0].real
    geom = ecp_geometry(20, nphi=25)
    f = np.asarray(SHT(geom, lmax).alm2map(a))
    fac = np.sqrt((2 * np.arange(lmax + 1) + 1) / (4 * np.pi))
    ring = 7
    x = np.array([np.cos(geom.theta[ring])])
    phis = geom.phi0 + 2 * np.pi * np.arange(geom.nphi) / geom.nphi
    fb = np.zeros(geom.nphi)
    for m in range(lmax + 1):
        dm = np.asarray(wig.wigner_dmat(lmax, m, 0, x))[:, 0]
        Fm = np.sum(a[ualm.getidx(lmax, np.arange(m, lmax + 1), m)] * (fac * dm)[m:])
        fb += (2. - (m == 0)) * np.real(Fm * np.exp(1j * m * phis))
    assert np.abs(f[ring] - fb).max() < 1e-10 * np.abs(fb).max()


def test_mxu_auto_dispatch_matches_streaming():
    # The MXU-shaped accumulate auto-enables for analysis at batch >= 16
    # (core._dispatch); its GEMM path must agree with the streaming accumulate to
    # roundoff, in both directions and on the fused NS-pair path, and the batch-2
    # auto path must be bit-identical to the forced-off path (dispatch stays off).
    import os
    lmax = 64
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax, dtype=np.float32)
    rng = np.random.RandomState(5)
    sz = ualm.getsize(lmax)

    def alms(batch):
        a = (rng.standard_normal((batch, sz))
             + 1j * rng.standard_normal((batch, sz))).astype(np.complex64)
        ls, ms = ualm._lm_indices(lmax)
        return np.where(ms[None, :] == 0, a.real, a)

    for batch in (2, 16):
        glm, clm = alms(batch), alms(batch)
        os.environ['PLK_SHT_MXU'] = '0'
        try:
            q0, u0 = map(np.asarray, sht.alm2map_spin((glm, clm), 2))
            e0 = np.asarray(sht.map2alm_spin((q0, u0), 2)[0])
        finally:
            del os.environ['PLK_SHT_MXU']
        qa, _ = map(np.asarray, sht.alm2map_spin((glm, clm), 2))   # auto dispatch
        ea = np.asarray(sht.map2alm_spin((q0, u0), 2)[0])
        assert np.abs(qa - q0).max() <= 1e-5 * np.abs(q0).max()
        assert np.abs(ea - e0).max() <= 1e-5 * np.abs(e0).max()
        if batch < 16:
            continue   # forced-MXU compile covered once, at the dispatch batch
        os.environ['PLK_SHT_MXU'] = '1'                            # forced, both dirs
        try:
            q1, _ = map(np.asarray, sht.alm2map_spin((glm, clm), 2))
            e1 = np.asarray(sht.map2alm_spin((q0, u0), 2)[0])
        finally:
            del os.environ['PLK_SHT_MXU']
        assert np.abs(q1 - q0).max() <= 1e-5 * np.abs(q0).max()
        assert np.abs(e1 - e0).max() <= 1e-5 * np.abs(e0).max()


def test_mmax_truncation_and_mmax0():
    """mmax < lmax transforms: synthesis/analysis act on the azimuthally-truncated
    band, with m > mmax alm entries ignored/zeroed (round-4 review findings: the
    mmax=0 FFT-bin placement crashed, and analysis at mmax < lmax silently CLAMPED
    the m gather, returning wrong values for m > mmax)."""
    lmax = 16
    geom = gl_geometry(lmax)
    rng = np.random.RandomState(5)
    ls, ms = ualm._lm_indices(lmax)
    alm = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls)))[None]
    alm[:, ms == 0] = alm[:, ms == 0].real

    full = SHT(geom, lmax)
    for mmax in (0, 4):
        sht = SHT(geom, lmax, mmax=mmax)
        m = np.asarray(sht.alm2map(alm))
        alm_cut = np.where(ms[None] <= mmax, alm, 0.)
        m_ref = np.asarray(full.alm2map(alm_cut))
        assert np.abs(m - m_ref).max() < 1e-10 * np.abs(m_ref).max(), mmax
        back = np.asarray(sht.map2alm(m))
        assert np.abs(back - alm_cut).max() < 1e-8 * np.abs(alm_cut).max(), mmax
        assert not np.any(back[:, ms > mmax]), 'm > mmax must come back exactly zero'
    # mmax=0 maps are azimuthally constant
    sht0 = SHT(geom, lmax, mmax=0)
    m0 = np.asarray(sht0.alm2map(alm))
    assert np.allclose(m0[0], m0[0][:, :1], atol=1e-12 * np.abs(m0).max())
