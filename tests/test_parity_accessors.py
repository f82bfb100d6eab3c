"""Name-level parity accessors (round 5): the reference's remaining public methods —
sims curl field + noise-only draws, QE/qcl convenience accessors — and the curl-lensing
capability the reference itself leaves unimplemented (plancklens/sims/cmbs.py:196)."""
import os

import numpy as np
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile
from plancklens_tpu.utils import alm as ualm
from plancklens_tpu.ops.sht.geometry import gl_geometry

LMAX = 48


def _cls(lmax=LMAX):
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    return cls


def test_unllib_olm_and_generic_alm():
    from plancklens_tpu.models.sims import CMBUnlLib
    cls = _cls()
    ls = np.arange(LMAX + 1, dtype=float)
    cls = dict(cls, pp=1e-7 / (ls + 2.) ** 4, oo=5e-8 / (ls + 2.) ** 4)
    lib = CMBUnlLib(cls, LMAX, fields=('t', 'e', 'b', 'p', 'o'), seed=3)
    olm = np.asarray(lib.get_sim_olm(4))
    assert olm.shape == (ualm.getsize(LMAX),)
    # generic accessor is the indexed row of get_sim_alms
    alms = np.asarray(lib.get_sim_alms(4))
    for i, f in enumerate(lib.fields):
        assert np.array_equal(np.asarray(lib.get_sim_alm(4, f)), alms[i])
    # the drawn ω has the right spectrum on average (loose MC check over sims)
    hat = np.mean([np.asarray(ualm.alm2cl(lib.get_sim_olm(i), LMAX))
                   for i in range(40)], axis=0)
    band = slice(8, LMAX + 1)   # enough modes per l for a 40-sim average
    assert np.allclose(hat[band], cls['oo'][band], rtol=0.5)
    # and an unknown field raises
    with pytest.raises(AssertionError):
        lib.get_sim_alm(0, 'q')


def test_lenlib_curl_deflection_wired():
    """CMBLenLib with 'o' in fields must DEFLECT with the curl component — the lensed
    map equals the direct Lensing-op call with olm passed, and differs from the
    gradient-only deflection."""
    from plancklens_tpu.models.sims import CMBLenLib
    cls = _cls()
    ls = np.arange(LMAX + 128 + 1, dtype=float)
    cls_unl = dict(_cls(LMAX + 128), pp=1e-5 / (ls + 2.) ** 4,
                   oo=1e-5 / (ls + 2.) ** 4)
    geom = gl_geometry(LMAX + 16)
    lib = CMBLenLib(cls_unl, LMAX, geom, fields=('t', 'e', 'b', 'p', 'o'), seed=5)
    alms = lib.unl_lib.get_sim_alms(0)
    it = lib.unl_lib._field_index('t')
    ip = lib.unl_lib._field_index('p')
    io = lib.unl_lib._field_index('o')
    tmap = np.asarray(lib.get_sim_tmap(0))
    direct = np.asarray(lib.lensing.alm2lenmap(alms[it], alms[ip], olm=alms[io])[0])
    assert np.array_equal(tmap, direct)
    grad_only = np.asarray(lib.lensing.alm2lenmap(alms[it], alms[ip])[0])
    assert not np.allclose(tmap, grad_only)
    # olm accessor: band-limited copy of the unlensed draw
    olm = np.asarray(lib.get_sim_olm(0))
    assert np.array_equal(olm, np.asarray(
        ualm.alm_copy(alms[io], lib.lmax_unl, LMAX)))
    # the Q/U path deflects with curl too
    qu = np.asarray(lib.get_sim_pmap(0))
    ie, ib = lib.unl_lib._field_index('e'), lib.unl_lib._field_index('b')
    qd, ud = lib.lensing.alm2lenmap_spin((alms[ie], alms[ib]), alms[ip], 2,
                                         olm=alms[io])
    assert np.array_equal(qu[0], np.asarray(qd[0]))
    assert np.array_equal(qu[1], np.asarray(ud[0]))


def test_mapsnlevlib_noise_accessors_identity():
    """obs = b_l * cmb + noise must hold exactly with the noise-only accessors."""
    from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib
    cls = _cls()
    cmb = CMBUnlLib(cls, LMAX, fields=('t', 'e', 'b'), seed=11)
    bl = np.exp(-0.005 * np.arange(LMAX + 1.) ** 2)
    lib = MapsNlevLib(cmb, bl, 35., 35. * np.sqrt(2.), seed=12)
    idx = 3
    alms = np.asarray(cmb.get_sim_alms(idx))
    blv = np.asarray(ualm.almxfl(alms[0], LMAX, bl))
    tot = np.asarray(lib.get_sim_tlm(idx))
    noise = np.asarray(lib.get_sim_tnoise(idx))
    assert np.allclose(tot, blv + noise, rtol=0, atol=1e-10 * np.abs(tot).max())
    for f, i in (('e', 1), ('b', 2)):
        blv = np.asarray(ualm.almxfl(alms[i], LMAX, bl))
        tot = np.asarray(getattr(lib, 'get_sim_%slm' % f)(idx))
        noise = np.asarray(getattr(lib, 'get_sim_%snoise' % f)(idx))
        assert np.allclose(tot, blv + noise, rtol=0, atol=1e-10 * np.abs(tot).max())
    # white-noise level sanity: <|n|^2> ~ (nlev rad)^2
    nl = np.asarray(ualm.alm2cl(lib.get_sim_tnoise(idx), LMAX))
    sig2 = (35. / 60. / 180. * np.pi) ** 2
    assert abs(np.mean(nl[2:]) / sig2 - 1.) < 0.25


def test_mapslennlevlib_pixel_noise_accessors_identity():
    from plancklens_tpu.models.sims import CMBLenLib, MapsLenNlevLib
    ls = np.arange(LMAX + 128 + 1, dtype=float)
    cls_unl = dict(_cls(LMAX + 128), pp=1e-6 / (ls + 2.) ** 4)
    geom = gl_geometry(LMAX + 16)
    lenlib = CMBLenLib(cls_unl, LMAX, geom, seed=21)
    bl = np.exp(-0.005 * np.arange(LMAX + 1.) ** 2)
    lib = MapsLenNlevLib(lenlib, bl, 35., 35. * np.sqrt(2.), seed=22)
    idx = 1
    # signal part: beam-convolved re-analysis of the lensed map
    tlm = lenlib.sht.map2alm(lenlib.get_sim_tmap(idx))
    sig = np.asarray(lenlib.sht.alm2map(ualm.almxfl(tlm, LMAX, bl)))
    tot = np.asarray(lib.get_sim_tmap(idx))
    noise = np.asarray(lib.get_sim_tnoise(idx))
    assert np.allclose(tot, sig + noise, rtol=0, atol=1e-8 * np.abs(tot).max())
    q, u = lib.get_sim_pmap(idx)
    elm, blm = lenlib.get_sim_eblm(idx)
    qs, us = lenlib.sht.alm2map_spin((ualm.almxfl(elm, LMAX, bl),
                                      ualm.almxfl(blm, LMAX, bl)), 2)
    assert np.allclose(np.asarray(q), np.asarray(qs) + np.asarray(lib.get_sim_qnoise(idx)),
                       rtol=0, atol=1e-8 * np.abs(np.asarray(q)).max())
    assert np.allclose(np.asarray(u), np.asarray(us) + np.asarray(lib.get_sim_unoise(idx)),
                       rtol=0, atol=1e-8 * np.abs(np.asarray(u)).max())


def _small_qe():
    from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib
    from plancklens_tpu.models.filt import IVFSepTP
    from plancklens_tpu.models.qest import QELib
    from plancklens_tpu.utils.cls import cli
    cls = _cls()
    transf = np.ones(LMAX + 1)
    cmb = CMBUnlLib(cls, LMAX, fields=('t', 'e', 'b'), seed=31)
    sims = MapsNlevLib(cmb, transf, 35., 35. * np.sqrt(2.), seed=32)
    nt2 = (35. / 60. / 180. * np.pi) ** 2
    ftl = cli(cls['tt'] + nt2)
    fel = cli(cls['ee'] + 2. * nt2)
    fbl = cli(cls['bb'] + 2. * nt2)
    ivfs = IVFSepTP(sims, transf, cls, ftl, fel, fbl)
    return QELib(ivfs, ivfs, cls, LMAX, LMAX)


def test_qelib_accessors():
    qe = _small_qe()
    # fundamental-key decomposition pinned to the reference semantics
    # (plancklens/qest.py:122-141)
    assert qe.get_fundkeys('ptt') == ['ptt']
    assert qe.get_fundkeys('p_tp') == ['ptt', 'p_p']
    assert qe.get_fundkeys('p_eb') == ['peb', 'pbe']
    assert qe.get_fundkeys('ptt_bh_s') == ['ptt', 'stt']
    assert qe.get_fundkeys(['p_tp', 'ptt']) == ['ptt', 'p_p']  # ordered, de-duplicated
    assert qe.get_fundkeys('p_bh_s') == ['p', 's']
    with pytest.raises(ValueError):
        qe.get_fundkeys('ztt')
    assert qe.get_lmax_qlm('ptt') == LMAX
    # full-sky harmonic library: trivial masks and sky fractions
    assert qe.get_mask(1) == 1. and qe.get_mask(2) == 1.
    for i in (11, 22, 12):
        assert qe.get_fsky(i) == 1.
    with pytest.raises(AssertionError):
        qe.get_fsky(21)
    # data convention: get_dat_qlm == get_sim_qlm(k, -1)
    dat = np.asarray(qe.get_dat_qlm('ptt'))
    assert np.array_equal(dat, np.asarray(qe.get_sim_qlm('ptt', -1)))


def test_qecllib_accessors():
    from plancklens_tpu.models.qecl import QeClLib
    qe = _small_qe()
    lib = QeClLib(qe, qe, np.array([], dtype=int))
    assert lib.get_lmaxqcl('ptt', 'ptt') == LMAX
    with pytest.raises(KeyError):
        lib.load_sim_qcl('ptt', 0)
    computed = lib.get_sim_qcl('ptt', 0)
    assert np.array_equal(lib.load_sim_qcl('ptt', 0), computed)
    dat = lib.get_dat_qcl('ptt')
    assert np.array_equal(dat, lib.get_sim_qcl('ptt', -1))
    assert np.all(np.isfinite(dat))


def test_qecl_average_accessors():
    from plancklens_tpu.models.qecl import QeClLib, QeClAverage
    qe = _small_qe()
    libA = QeClLib(qe, qe, np.array([], dtype=int))
    avg = QeClAverage([libA, libA])
    assert avg.get_lmaxqcl('ptt', 'ptt') == LMAX
    assert np.allclose(avg.get_dat_qcl('ptt'), libA.get_dat_qcl('ptt'))
