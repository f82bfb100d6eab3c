"""Coverage for public components the suite did not yet exercise directly:
CinvKK (kappa-map Wiener filter, reference opfilt_kk), full low-l template
marginalisation (template_uptolmin + extra templates in NinvFilterT), the
sim-library combinators (SimLibShuffle / SimLibAdd, reference sims/utils.py),
cacher_pk, and the small cls utilities (arr2cldict, smooth_map)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
from plancklens_tpu.ops.sht import SHT, gl_geometry

LMAX = 32


def _clpp(lmax):
    return camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lenspotentialCls.dat'),
                       lmax=lmax)['pp']


def test_cinv_kk_homogeneous_matches_isotropic():
    """On a homogeneous full-sky system the KK solve is diagonal: the Wiener solution
    equals clkk/(clkk + N) kappa_obs, i.e. apply_ivf returns 1/(clkk + N) kappa_obs
    (reference: plancklens/qcinv/opfilt_kk.py)."""
    from plancklens_tpu.models.cinv import CinvKK, p2k_fl
    geom = gl_geometry(LMAX)
    clpp = _clpp(LMAX)
    clkk = p2k_fl(LMAX) ** 2 * clpp
    omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
    # homogeneous pixel noise with kappa-scale variance so neither term dominates
    nlev2_st = np.mean(clkk[LMAX // 2:])          # per-steradian noise power
    ninv = omega / nlev2_st
    sht = SHT(geom, LMAX)
    rng = np.random.RandomState(2)
    ls, ms = ualm._lm_indices(LMAX)
    kobs = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))) \
        * np.sqrt(np.maximum(clkk, 0.))[ls]
    kobs = np.where(ms == 0, kobs.real, kobs).astype(complex)
    kmap = np.asarray(sht.alm2map(jnp.asarray(kobs)))
    cinv = CinvKK(LMAX, geom, clpp, np.ones(LMAX + 1), ninv, eps_min=1e-9,
                  marge_monopole=False, marge_dipole=False)
    ivf = np.asarray(cinv.apply_ivf(kmap))[0]
    expect = cli(clkk + nlev2_st)[ls] * kobs
    sel = ls >= 1
    err = np.abs(ivf - expect)[sel].max() / np.abs(expect)[sel].max()
    assert err < 1e-5, err


def test_template_uptolmin_full_lowl_marginalisation():
    """template_uptolmin(geom, lmin) gives (lmin+1)^2 maps spanning all l <= lmin
    modes; plugged into NinvFilterT as extra templates, the filtered map is exactly
    orthogonal to every one of them (full low-l marginalisation, reference
    template_removal.template_uptolmin)."""
    from plancklens_tpu.models.cinv import NinvFilterT, template_uptolmin
    geom = gl_geometry(LMAX)
    lmin = 3
    tmpl = template_uptolmin(geom, lmin)
    assert tmpl.shape[0] == (lmin + 1) ** 2
    # the maps really span l <= lmin: analysing any of them gives no power above lmin
    sht = SHT(geom, LMAX)
    a = np.asarray(sht.map2alm(jnp.asarray(tmpl[5][None])))[0]
    ls, _ = ualm._lm_indices(LMAX)
    assert np.abs(a[ls > lmin]).max() < 1e-10 * np.abs(a).max()
    omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
    sig = (30. / 60. / 180. * np.pi) / np.sqrt(omega)
    ninv = (1. / sig ** 2) * (np.abs(np.cos(geom.theta))[:, None] > 0.2)
    filt = NinvFilterT(geom, ninv, np.ones(LMAX + 1), marge_monopole=False,
                       marge_dipole=False, templates=list(tmpl))
    rng = np.random.RandomState(4)
    m = rng.standard_normal((1, geom.nrings, geom.nphi))
    out = np.asarray(filt.apply_map(jnp.asarray(m)))[0]
    # out is per-steradian N^-1-weighted: orthogonality is the plain pixel dot
    # against the templates times the pixel area
    coeffs = np.einsum('trp,rp->t', tmpl, out * omega)
    scale = np.einsum('trp,rp->t', np.abs(tmpl), np.abs(out) * omega)
    assert np.all(np.abs(coeffs) < 1e-8 * np.maximum(scale, 1e-300)), coeffs / scale


class _ConstLib:
    def __init__(self, val):
        self.val = val

    def hashdict(self):
        return {'v': float(self.val)}

    def get_sim_tlm(self, idx):
        return np.full(3, self.val * (idx + 100.))


def test_sim_lib_combinators():
    """SimLibShuffle remaps indices (the ds/ss mechanism); SimLibAdd adds weighted
    libraries on sim / data indices only (the reference's add_sim/add_dat 'dcl'
    extra-power mechanism, plancklens/sims/utils.py:20-91)."""
    from plancklens_tpu.models.sims import SimLibShuffle, SimLibAdd
    base = _ConstLib(1.)
    sh = SimLibShuffle(base, {0: 7, 1: -1})
    assert np.allclose(sh.get_sim_tlm(0), base.get_sim_tlm(7))
    assert np.allclose(sh.get_sim_tlm(1), base.get_sim_tlm(-1))
    assert np.allclose(sh.get_sim_tlm(5), base.get_sim_tlm(5))   # identity elsewhere
    extra = _ConstLib(0.5)
    add_sims = SimLibAdd(base, extra, w_a=1., w_b=2., sims_only=True)
    assert np.allclose(add_sims.get_sim_tlm(3),
                       base.get_sim_tlm(3) + 2. * extra.get_sim_tlm(3))
    assert np.allclose(add_sims.get_sim_tlm(-1), base.get_sim_tlm(-1))   # data: no add
    add_dat = SimLibAdd(base, extra, dat_only=True)
    assert np.allclose(add_dat.get_sim_tlm(3), base.get_sim_tlm(3))
    assert np.allclose(add_dat.get_sim_tlm(-1),
                       base.get_sim_tlm(-1) + extra.get_sim_tlm(-1))


def test_cacher_pk_roundtrip(tmp_path):
    from plancklens_tpu.utils.cachers import cacher_pk
    c = cacher_pk(str(tmp_path))
    obj = {'a': np.arange(5.), 'b': (1, 'two')}
    assert not c.is_cached('x/y')
    c.cache('x/y', obj)
    assert c.is_cached('x/y')
    back = c.load('x/y')
    assert np.allclose(back['a'], obj['a']) and back['b'] == obj['b']


def test_arr2cldict_roundtrip_and_smooth_map():
    from plancklens_tpu.utils.cls import arr2cldict, cldict2arr, smooth_map
    lmax = 16
    cls = {'tt': np.arange(1., lmax + 2.), 'ee': 0.5 * np.arange(1., lmax + 2.),
           'te': 0.1 * np.ones(lmax + 1)}
    back = arr2cldict(cldict2arr(cls))
    for k, v in cls.items():
        assert np.allclose(back[k], v), k
    assert 'bb' not in back   # identically-zero entries dropped
    # smoothing: an l-eigenmode map is scaled by exp(-l(l+1) sigma^2 / 2)
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    ls, _ = ualm._lm_indices(lmax)
    alm = jnp.asarray(np.where(ls == 8, 1. + 0j, 0.))[None]
    m = np.asarray(sht.alm2map(alm))[0]
    sigma = 0.05
    sm = smooth_map(m, geom, sigma, lmax=lmax)
    expect = np.exp(-0.5 * 8 * 9 * sigma ** 2)
    ratio = np.asarray(sm).ravel() @ m.ravel() / (m.ravel() @ m.ravel())
    assert abs(ratio - expect) < 1e-6 * expect, (ratio, expect)


def test_anal_block_env_knob_rekeys_jit_cache(monkeypatch):
    """PLK_SHT_ANAL_BLOCK is resolved per call and enters the jitted kernel as a
    static arg: changing it mid-process must recompile (and agree numerically), not
    silently reuse the first-compiled block size (round-4 review finding)."""
    from plancklens_tpu.ops.sht import core
    geom = gl_geometry(48)   # 49 rings: blocked path active at small blocks
    sht = SHT(geom, 48)
    rng = np.random.RandomState(3)
    m = rng.standard_normal((1, geom.nrings, geom.nphi))
    monkeypatch.setenv('PLK_SHT_ANAL_BLOCK', '8')
    n0 = core._legendre_pair_ns._cache_size()
    a8 = np.asarray(sht.map2alm(m))
    n1 = core._legendre_pair_ns._cache_size()
    monkeypatch.setenv('PLK_SHT_ANAL_BLOCK', '16')
    a16 = np.asarray(sht.map2alm(m))
    n2 = core._legendre_pair_ns._cache_size()
    assert n1 > n0 and n2 > n1, (n0, n1, n2)   # each block size is its own program
    assert np.allclose(a8, a16, rtol=1e-10, atol=1e-12)


def test_n1_kwargs_can_override_lmaxphi():
    """n1_kwargs is advertised as 'feed N1Lib'; lmaxphi is a first-class N1Lib knob
    and must override the forecast default instead of raising a duplicate-keyword
    TypeError (round-4 review finding)."""
    from plancklens_tpu.models import n0s
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=250)
    _, N0_u, N1_b, N1_u = n0s.get_N0_iter(
        'p_p', 1.0, 1.4, 2.0, unl, lmin_ivf=30, lmax_ivf=200, itermax=0,
        lmax_qlm=100, include_n1=True, n1_lmax=80,
        n1_kwargs={'lmaxphi': 300, 'dL': 40})
    assert np.all(np.isfinite(N1_u[0])) and np.any(N1_u[0][30:80] > 0.)


def test_input_plm_lib_curl_zeros_skip_the_sim_read():
    """The cross of a curl QE with the input (gradient) potential is identically
    zero; fabricating that zero array must not cost a full input-plm load per sim
    (round-4 review finding)."""
    from plancklens_tpu.models.qecl import InputPlmLib

    class _NoRead:
        def get_sim_plm(self, idx):
            raise AssertionError('curl key must not read the input plm')

        def hashdict(self):
            return {}

    lib = InputPlmLib(_NoRead(), lmax_qlm=16)
    out = np.asarray(lib.get_sim_qlm('xtt', 0))
    assert out.shape == (ualm.getsize(16),) and not out.any()
    batch = np.asarray(lib.get_sim_qlm_batch('x_p', [0, 1]))
    assert batch.shape == (2, ualm.getsize(16)) and not batch.any()


def test_fixed_phi_sim_libraries():
    """Fixed-phi sim libraries (reference sims/cmbs.py:236-280): every index shares one
    lensing potential while the CMB fields vary — the mean-field-study configuration."""
    from plancklens_tpu.models.sims import (CMBUnlLibFixedPhi, CMBLenLibFixedPhi,
                                            CMBUnlLib)
    lmax = 24
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=lmax + 8)
    lib = CMBUnlLibFixedPhi(cls, lmax, seed=1, phi_idx=0)
    base = CMBUnlLib(cls, lmax, seed=1)
    plm0, plm5 = np.asarray(lib.get_sim_plm(0)), np.asarray(lib.get_sim_plm(5))
    assert np.array_equal(plm0, plm5), 'phi must be identical across indices'
    assert np.array_equal(plm0, np.asarray(base.get_sim_plm(0))), \
        'default fixed phi is the base library sim-0 draw'
    assert not np.allclose(np.asarray(lib.get_sim_tlm(0)),
                           np.asarray(lib.get_sim_tlm(5))), 'CMB fields must vary'
    batch = np.asarray(lib.get_sim_alms_batch([1, 3]))
    ip = lib._field_index('p')
    assert np.array_equal(batch[0, ip], plm0) and np.array_equal(batch[1, ip], plm0)
    assert lib.hashdict() != base.hashdict()
    # explicit external plm
    ext = np.zeros(ualm.getsize(lmax), dtype=complex)
    ext[ualm.getsize(lmax) // 2] = 1. + 0j
    lib2 = CMBUnlLibFixedPhi(cls, lmax, seed=1, plm=ext)
    assert np.array_equal(np.asarray(lib2.get_sim_plm(7)), ext)
    assert lib2.hashdict() != lib.hashdict()
    # lensed variant: same deflection for every index, different skies
    geom = gl_geometry(lmax + 16)
    llib = CMBLenLibFixedPhi(cls, lmax, geom, seed=2, dlmax=8)
    assert np.array_equal(np.asarray(llib.get_sim_plm(0)),
                          np.asarray(llib.get_sim_plm(4)))
    t0, t4 = np.asarray(llib.get_sim_tmap(0)), np.asarray(llib.get_sim_tmap(4))
    assert not np.allclose(t0, t4)
