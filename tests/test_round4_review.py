"""Regression tests for the round-4 models-layer review findings: wrapper batch paths,
cache-key discipline (N1 te-fiducial, QELib transf/profile, NhlLib fsky), pol-only
IVFCinv masks, SimLibAdd tuple/batch returns, forecast edge cases, and the qe_eval
mixed-term guard."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm

LMAX = 8


def _alm(idx, seed_off=0):
    rng = np.random.RandomState(100 + idx + seed_off)
    n = ualm.getsize(LMAX)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(complex)


class _FakeIVFS:
    """Minimal batched filtering library: per-index and batch accessors agree."""

    def get_sim_tlm(self, idx):
        return jnp.asarray(_alm(idx, 0))

    def get_sim_elm(self, idx):
        return jnp.asarray(_alm(idx, 50))

    def get_sim_blm(self, idx):
        return jnp.asarray(_alm(idx, 90))

    def get_sim_tmliklm(self, idx):
        return jnp.asarray(2. * _alm(idx, 0))

    def get_sim_emliklm(self, idx):
        return jnp.asarray(2. * _alm(idx, 50))

    def get_sim_bmliklm(self, idx):
        return jnp.asarray(2. * _alm(idx, 90))

    def get_sim_teblm_batch(self, idxs):
        idxs = np.atleast_1d(idxs)
        return (jnp.stack([jnp.asarray(_alm(int(i), 0)) for i in idxs]),
                jnp.stack([jnp.asarray(_alm(int(i), 50)) for i in idxs]),
                jnp.stack([jnp.asarray(_alm(int(i), 90)) for i in idxs]))

    def get_ftl(self):
        return np.ones(LMAX + 1)

    def get_fel(self):
        return np.ones(LMAX + 1)

    def get_fbl(self):
        return np.ones(LMAX + 1)

    def hashdict(self):
        return {'fake': True}


def test_ivfshuffle_batch_remaps_indices():
    """IVFShuffle must remap each index of the BATCHED accessor (the scalar wrapper
    passed the whole array into the dict lookup — review finding)."""
    from plancklens_tpu.models.filt import IVFShuffle
    base = _FakeIVFS()
    lib = IVFShuffle(base, {0: 3, 1: 4})
    t, e, b = lib.get_sim_teblm_batch([0, 1, 2])
    t_ref, e_ref, b_ref = base.get_sim_teblm_batch([3, 4, 2])
    assert np.array_equal(np.asarray(t), np.asarray(t_ref))
    assert np.array_equal(np.asarray(e), np.asarray(e_ref))
    assert np.array_equal(np.asarray(b), np.asarray(b_ref))
    # per-index path still remapped
    assert np.array_equal(np.asarray(lib.get_sim_tlm(0)),
                          np.asarray(base.get_sim_tlm(3)))


def test_ivffml_batch_and_wiener_are_rescaled():
    """IVFFml must apply the (l, m) rescale on the batched accessor and the Wiener
    legs (both silently forwarded unrescaled before — review finding), and must not
    forward unknown filtered-alm accessors."""
    from plancklens_tpu.models.filt import IVFFml
    base = _FakeIVFS()
    rng = np.random.RandomState(7)
    fm = {k: rng.uniform(0.5, 1.5, (LMAX + 1, LMAX + 1)) for k in 'teb'}
    lib = IVFFml(base, fm['t'], fm['e'], fm['b'])
    # batch == per-index
    t, e, b = lib.get_sim_teblm_batch([0, 2])
    for i, idx in enumerate((0, 2)):
        assert np.allclose(np.asarray(t)[i], np.asarray(lib.get_sim_tlm(idx)))
        assert np.allclose(np.asarray(e)[i], np.asarray(lib.get_sim_elm(idx)))
        assert np.allclose(np.asarray(b)[i], np.asarray(lib.get_sim_blm(idx)))
    # Wiener legs rescaled with the same matrices
    ls, ms = ualm._lm_indices(LMAX)
    expect = np.asarray(base.get_sim_tmliklm(1)) * fm['t'][ls, ms]
    assert np.allclose(np.asarray(lib.get_sim_tmliklm(1)), expect)
    # spectra view is attenuated, not the inner passthrough
    assert np.all(lib.get_ftl() <= np.sqrt(fm['t'].max()) + 1e-12)
    with pytest.raises(AttributeError):
        lib.get_sim_tmap(0)


def test_n1_cache_key_includes_cltefid():
    """Two N1 evaluations differing only in the TE fiducial must not serve each other
    from the cache (review finding: cltefid was missing from the key)."""
    from plancklens_tpu.models.n1 import N1Lib
    lmax = 50
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    clpp = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lenspotentialCls.dat'),
                       lmax=120)['pp']
    fl = np.ones(lmax + 1)
    lib = N1Lib(cls['tt'], cls['te'], cls['ee'], lmaxphi=100, dL=30)
    n1_a = lib.get_n1('pte', 'p', clpp, fl, fl, fl, 20)
    n1_b = lib.get_n1('pte', 'p', clpp, fl, fl, fl, 20,
                      cltefid=np.zeros(lmax + 1))
    assert not np.allclose(n1_a, n1_b), \
        'changed cltefid must recompute, not load the stale cached curve'


def test_qelib_hashdict_and_cache_names_cover_transf_profile():
    from plancklens_tpu.models.qest import QELib
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    base = _FakeIVFS()
    tr1 = np.ones(LMAX + 1)
    tr2 = np.exp(-0.01 * np.arange(LMAX + 1) ** 2)
    q1 = QELib(base, base, cls, LMAX, LMAX, transf=tr1)
    q2 = QELib(base, base, cls, LMAX, LMAX, transf=tr2)
    q3 = QELib(base, base, cls, LMAX, LMAX, transf=tr1, profile=np.arange(LMAX + 1.))
    assert q1.hashdict() != q2.hashdict()
    assert q1.hashdict() != q3.hashdict()
    assert q1._ctag != q2._ctag and q1._ctag != q3._ctag, \
        'transf/profile must enter the persistent cache names'


def test_nhllib_fsky_enters_hash_and_cache_name():
    from plancklens_tpu.models.nhl import NhlLib
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    base = _FakeIVFS()
    la = NhlLib(base, cls, LMAX, fsky=1.)
    lb = NhlLib(base, cls, LMAX, fsky=0.7)
    assert la.hashdict() != lb.hashdict()
    assert la._ftag != lb._ftag
    # same shared cacher: the two libraries must not serve each other
    cacher = la.cacher
    lb.cacher = cacher
    ra = la.get_sim_nhl(0, 'ptt', 'ptt')
    rb = lb.get_sim_nhl(0, 'ptt', 'ptt')
    assert not np.allclose(ra, rb), 'fsky-scaled N0s served across libraries'
    # each Wick pairing multiplies TWO empirical spectra, each divided by fsky
    assert np.allclose(rb[1:], ra[1:] / 0.7 ** 2, rtol=1e-6)


def test_simlibadd_tuple_and_batch_returns():
    from plancklens_tpu.models.sims import SimLibAdd

    class _PairLib:
        def __init__(self, off):
            self.off = off

        def get_sim_pmap(self, idx):
            q = np.full(4, float(idx + self.off))
            return q, 2. * q

        def get_sim_teblm_batch(self, idxs):
            idxs = np.atleast_1d(idxs)
            mk = lambda k: np.stack([np.full(3, float(i + self.off + k))
                                     for i in idxs])
            return mk(0), mk(10), mk(20)

        def hashdict(self):
            return {'off': self.off}

    lib = SimLibAdd(_PairLib(0), _PairLib(100), w_a=1., w_b=0.5)
    q, u = lib.get_sim_pmap(2)
    assert np.allclose(q, 2. + 0.5 * 102.) and np.allclose(u, 2. * (2. + 0.5 * 102.))
    t, e, b = lib.get_sim_teblm_batch([0, 1])
    assert np.allclose(t[1], 1. + 0.5 * 101.)
    assert np.allclose(e[0], 10. + 0.5 * 110.)
    # mixed active/inactive batches are refused, not silently mis-summed
    lib_sims = SimLibAdd(_PairLib(0), _PairLib(100), sims_only=True)
    with pytest.raises(ValueError):
        lib_sims.get_sim_teblm_batch([-1, 0])
    t, _, _ = lib_sims.get_sim_teblm_batch([0, 1])   # all-active: summed
    assert np.allclose(t[0], 0. + 100.)


def test_pol_nlev_pair_and_array_rho2_iter0():
    from plancklens_tpu.models import n0s
    # (E, B) scalar pair splits
    e, b = n0s._pol_nlevs([2.0, 2.5])
    assert float(e) == 2.0 and float(b) == 2.5
    # array rho_sqd_ext survives iteration 0 (broadcast bug — review finding)
    lmax = 120
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=400)
    rho2 = np.full(lmax + 1, 0.5)
    _, N0u = n0s.get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 250, 1,
                             lmax_qlm=lmax, rho_sqd_ext=rho2)
    assert np.all(np.isfinite(N0u)) and N0u.shape[0] == 2


def test_qe_eval_refuses_mixed_term_lists():
    from plancklens_tpu.models.qest import qe_eval
    from plancklens_tpu.models import qresp
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    mixed = qresp.get_qes('ptt', LMAX, cls) + qresp.get_qes('stt', LMAX, cls)
    base = _FakeIVFS()

    def get_alm(f):
        return jnp.asarray(_alm(0))[None]

    with pytest.raises(AssertionError):
        qe_eval(mixed, get_alm, LMAX)


def test_ivfcinv_pol_only_fmask():
    """IVFCinv with cinv_t=None (pol-only pipeline) must report the polarisation
    mask instead of crashing on the absent temperature solver (review finding)."""
    from plancklens_tpu.models.cinv import CinvP, IVFCinv
    from plancklens_tpu.ops.sht import gl_geometry
    lmax = 16
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    geom = gl_geometry(lmax)
    ninv = np.ones((geom.nrings, geom.nphi))
    ninv[:2] = 0.   # masked polar rows
    cinv_p = CinvP(lmax, geom, cls, np.ones(lmax + 1), ninv,
                   eps_min=1e-3, iter_max=5)
    lib = IVFCinv(None, cinv_p, sim_lib=None, cl_weights=cls)
    mask = lib.get_fmask()
    assert mask.shape == ninv.shape
    assert not mask[:2].any() and mask[2:].all()
