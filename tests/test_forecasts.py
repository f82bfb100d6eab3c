"""Forecast-layer physics: iterative N0 improvement, patchy noise-level splitting,
frequency-weighted variance maps."""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile
from plancklens_tpu.ops.sht import gl_geometry
from plancklens_tpu.models import n0s
from plancklens_tpu.models.patchy import mk_patches
from plancklens_tpu.models.freq_weighting import vmaps2vmap_I


def test_n0_iter_decreases():
    # iterative delensing must lower the lensing reconstruction noise monotonically
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=400)
    N0sb, N0su = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 350, 3)
    N0su = np.asarray(N0su)
    sel = slice(20, 200)
    for it in range(1, N0su.shape[0]):
        assert np.all(N0su[it][sel] <= N0su[it - 1][sel] * (1. + 1e-10)), it
    # first iteration is a substantial improvement at these deep noise levels
    assert np.median(N0su[1][sel] / N0su[0][sel]) < 0.9


def test_n0_iter_external_tracer():
    """A perfect external tracer (rho^2 = 1) removes all lensing already at iteration 0:
    the iteration-0 N0 must match (nearly) the fully-delensed internal result, and a
    partial tracer must land between none and perfect."""
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=400)
    sel = slice(20, 200)
    _, N0_int = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 350, 4)
    _, N0_ext = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 350, 0, rho_sqd_ext=1.)
    _, N0_half = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 350, 0, rho_sqd_ext=0.5)
    # perfect tracer at it=0 beats (or matches) 4 internal iterations
    assert np.median(N0_ext[0][sel] / N0_int[-1][sel]) < 1.05
    # and is much better than no delensing
    assert np.median(N0_ext[0][sel] / N0_int[0][sel]) < 0.7
    # partial tracer interpolates
    assert np.all(N0_ext[0][sel] <= N0_half[0][sel] * (1 + 1e-10))
    assert np.all(N0_half[0][sel] <= N0_int[0][sel] * (1 + 1e-10))


def test_n0_iter_filter_E():
    """Linear delensing with imperfect E knowledge (filter_E) must help relative to no
    delensing but cannot beat the perfect-E iterative result; residual BB must drop."""
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=400)
    sel = slice(20, 200)
    kw = dict(cls_unl_fid=unl, lmin_ivf=30, lmax_ivf=350, itermax=2)
    _, N0_perf, dcls_p, _ = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, ret_delcls=True, **kw)
    _, N0_filt, dcls_f, _ = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, ret_delcls=True,
                                            filter_E=True, **kw)
    # iteration 0 identical (no delensing happened yet, rho_sqd_phi = 0)
    assert np.allclose(N0_filt[0][sel], N0_perf[0][sel], rtol=1e-6)
    # delensing still helps ...
    assert np.median(N0_filt[-1][sel] / N0_filt[0][sel]) < 0.95
    # ... but imperfect E knowledge cannot beat the perfect-E forecast
    assert np.median(N0_perf[-1][sel] / N0_filt[-1][sel]) < 1.01
    # residual BB after delensing is reduced, and less reduced than with perfect E
    bsel = slice(30, 300)
    bb0 = np.median(dcls_f[0]['bb'][bsel])
    bb_filt = np.median(dcls_f[-1]['bb'][bsel])
    bb_perf = np.median(dcls_p[-1]['bb'][bsel])
    assert bb_filt < bb0
    assert bb_perf < bb_filt * (1. + 1e-10)


def test_patchy_two_level_split():
    geom = gl_geometry(64)
    z = np.cos(geom.theta)[:, None]
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    nl = np.where(z > 0, 20., 40.) * np.ones_like(omega)
    ivmap = omega / (nl / 60. / 180. * np.pi) ** 2
    nlevs, nlevs_dat, nlev_fid, fskies = mk_patches(2, ivmap.ravel(), omega.ravel())
    assert np.allclose(nlevs, [20., 40.])
    assert np.allclose(fskies, [0.5, 0.5], atol=0.02)


def test_freq_weighting_variance_map():
    # (a) averaging two identical-noise frequencies with half weights halves the variance;
    # (b) a flat band-limited weight gives variance sum_l (2l+1) w_l^2 / (4 pi) * Omega_pix
    lmax = 64
    geom = gl_geometry(2 * lmax)
    z = np.cos(geom.theta)[:, None]
    V = (2. + z + 0.3 * z ** 2) * np.ones((geom.nrings, geom.nphi))
    w = np.ones(lmax + 1)
    v1 = vmaps2vmap_I([V], [w], geom)
    v2 = vmaps2vmap_I([V, V], [w * .5, w * .5], geom)
    assert np.allclose(v2, 0.5 * v1, rtol=1e-6)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    expect = np.sum((2 * np.arange(lmax + 1) + 1.) * w ** 2) / (4. * np.pi) \
        * np.mean(omega) * V
    r = v1[5:-5] / expect[5:-5]
    assert np.abs(r - 1.).max() < 0.02, (r.min(), r.max())


def test_patchy_homogeneous_limit():
    # uniform variance map: all patches identical, every weighting scheme must reduce to
    # the single isotropic N0 and the MC corrections to unity
    from plancklens_tpu.models.patchy import get_patchy_N0s
    lmax = 128
    cls_len = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                       'FFP10_wdipole_lensedCls.dat'), lmax=2 * lmax)
    cls_unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                       'FFP10_wdipole_lenspotentialCls.dat'), lmax=2 * lmax)
    geom = gl_geometry(32)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    nlev = 30.
    ivmap = omega / (nlev / 60. / 180. * np.pi) ** 2 * (1. + 0 * omega)
    # uniform ivmap requires the data-rms map argument for the patch split
    rv = np.full(ivmap.size, nlev)
    transf = np.ones(lmax + 1)
    N0s, MC, cMC = get_patchy_N0s('ptt', 3, ivmap.ravel(), ivmap.ravel(), omega.ravel(),
                                  cls_unl, cls_len, cls_len, cls_len, 10, lmax, lmax,
                                  transf, rvmap_uKamin_t_data=rv, rvmap_uKamin_p_data=rv)
    vals = {k: np.asarray(v)[20:100] for k, v in N0s.items()}
    ref = list(vals.values())[0]
    for k, v in vals.items():  # all four weighting schemes coincide on a uniform map
        assert np.allclose(v, ref, rtol=1e-4), k
    # MC correction is O(1) (the lmin cut keeps it from exactly 1); must be finite/stable
    assert np.all(np.abs(np.asarray(MC)[20:100] - 1.) < 0.1)
    assert np.all(np.abs(np.asarray(cMC)[20:100] - 1.) < 0.1)


def test_n0_iter_include_n1():
    """include_n1 folds the self-contained N1 into the iterations (the reference needs
    external lensitbiases for this, plancklens/nhl.py:369-379): iteration 0 N0 is
    untouched (N1 only feeds back through the delensing residual), N1 is positive in
    band, and every later iteration's N0 is >= the N1-free one (delensing degraded by
    the extra reconstruction noise)."""
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=400)
    kw = dict(lmin_ivf=30, lmax_ivf=300, itermax=1, lmax_qlm=250)
    _, N0_u = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, **kw)
    _, N0_u1, N1_b, N1_u = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, include_n1=True,
                                           n1_lmax=250, **kw)
    sel = slice(30, 250)
    assert np.allclose(N0_u1[0], N0_u[0]), 'iteration-0 N0 must not change'
    assert np.all(N1_u[0][sel] > 0.)
    assert np.all(N0_u1[1][sel] >= N0_u[1][sel] * (1. - 1e-12))
    assert np.any(N0_u1[1][sel] > N0_u[1][sel] * (1. + 1e-6)), 'N1 had no effect'
    # N1 is a perturbation at these noise levels, not a blow-up
    assert np.median(N1_u[0][sel] / N0_u1[0][sel]) < 0.5


def test_patchy_inhomogeneous_two_level():
    """Genuinely inhomogeneous map (20 vs 40 uK-arcmin hemispheres): every weighting
    scheme's effective N0 must land between the two homogeneous extremes, optimal
    (MV) patch re-weighting can only lower the effective noise at fixed filtering,
    and the multiplicative MC correction departs from unity (it is the *point* of
    the patchy machinery; reference: plancklens/patchy/patchy.py:13-111)."""
    from plancklens_tpu.models.patchy import get_patchy_N0s, get_responses, get_nhls
    from plancklens_tpu.utils import cli
    lmax = 128
    cls_len = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                       'FFP10_wdipole_lensedCls.dat'), lmax=2 * lmax)
    cls_unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                       'FFP10_wdipole_lenspotentialCls.dat'),
                          lmax=2 * lmax)
    geom = gl_geometry(32)
    z = np.cos(geom.theta)[:, None]
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    nl = np.where(z > 0, 20., 40.) * np.ones_like(omega)
    ivmap = omega / (nl / 60. / 180. * np.pi) ** 2
    transf = np.ones(lmax + 1)
    lmin = 10
    N0s, MC, cMC = get_patchy_N0s('ptt', 2, ivmap.ravel(), ivmap.ravel(),
                                  omega.ravel(), cls_unl, cls_len, cls_len, cls_len,
                                  lmin, lmax, lmax, transf)
    # homogeneous extremes through the same response/nhl machinery
    sel = slice(20, 100)

    def hom_n0(nlev):
        r = get_responses('ptt', cls_len, cls_len, cls_len, lmin, lmax, lmax, transf,
                          [nlev], [1e30])[0][0]
        n = get_nhls('ptt', 'ptt', cls_len, cls_len, cls_len, lmin, lmax, lmax,
                     transf, [nlev], [nlev], [1e30], [1e30])[0][0]
        return (np.asarray(n) * cli(np.asarray(r)) ** 2)[sel]

    n0_deep, n0_shallow = hom_n0(20.), hom_n0(40.)
    assert np.all(n0_deep < n0_shallow)
    for k, v in N0s.items():
        vv = np.asarray(v)[sel]
        assert np.all(vv > 0.95 * n0_deep) and np.all(vv < 1.05 * n0_shallow), k
    # optimal re-weighting helps (or is neutral) at fixed filtering
    tol = 1.001
    assert np.all(np.asarray(N0s['hom-filt, mv-rew'])[sel]
                  <= tol * np.asarray(N0s['hom-filt, no-rew'])[sel])
    assert np.all(np.asarray(N0s['inhom-filt, mv-rew'])[sel]
                  <= tol * np.asarray(N0s['inhom-filt, no-rew'])[sel])
    # the inhomogeneity is detected: MC corrections depart from unity
    assert np.abs(np.asarray(MC)[sel] - 1.).max() > 1e-3
    assert np.all(np.isfinite(np.asarray(cMC)[sel]))


def test_freq_weighting_variance_map_pol():
    """Polarisation variance-map combination (reference: freq_weighting.py:46-79):
    averaging two identical-noise frequencies with half weights halves the variance,
    and the formula is symmetric under swapping the E and B weight functions (only
    the squared Wigner functions of w_E +/- w_B enter)."""
    from plancklens_tpu.models.freq_weighting import vmaps2vmap_P
    lmax = 48
    geom = gl_geometry(2 * lmax)
    z = np.cos(geom.theta)[:, None]
    V = (2. + z) * np.ones((geom.nrings, geom.nphi))
    we = np.ones(lmax + 1)
    wb = np.linspace(1., 0.5, lmax + 1)
    v1 = vmaps2vmap_P([V], we, wb, geom)
    v2 = vmaps2vmap_P([V, V], np.stack([we * .5] * 2), np.stack([wb * .5] * 2), geom)
    assert np.allclose(v2, 0.5 * v1, rtol=1e-6)
    v_swap = vmaps2vmap_P([V], wb, we, geom)
    assert np.allclose(v_swap, v1, rtol=1e-10)
    assert np.all(v1 > 0.)
