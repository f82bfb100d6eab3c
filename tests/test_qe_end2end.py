"""End-to-end QE pipeline test: Gaussian sims -> isotropic filtering -> QE -> spectrum.

For Gaussian (signal-free-phi) skies, the unnormalised QE spectrum must equal the
semi-analytic Gaussian N0 (reference physics: plancklens/nhl.py), and the mean-field of a
full-sky isotropic pipeline must vanish. This exercises sims, filt, qest (SHT path), nhl
and qresp together.
"""
import os
import numpy as np
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
from plancklens_tpu.models import nhl, qresp
from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib
from plancklens_tpu.models.filt import IVFSepTP
from plancklens_tpu.models.qest import QELib

LMAX = 72
LMIN = 8
NSIMS = 6
NLEV_T = 35.
NLEV_P = 35. * np.sqrt(2.)


def _setup():
    cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
    cls_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    transf = np.ones(LMAX + 1)
    nt2 = (NLEV_T / 60. / 180. * np.pi) ** 2
    np2 = (NLEV_P / 60. / 180. * np.pi) ** 2
    ftl = cli(cls_len['tt'] + nt2)
    fel = cli(cls_len['ee'] + np2)
    fbl = cli(cls_len['bb'] + np2)
    # low-l cut, as in any real analysis (reference: tests/test_w.py:53-55): without it the
    # enormous 1/N filter at the signal-free lowest multipoles dominates the estimator
    for fl in (ftl, fel, fbl):
        fl[:LMIN] = 0.
    cmb = CMBUnlLib(cls_len, LMAX, fields=('t', 'e', 'b'), seed=7)
    sims = MapsNlevLib(cmb, transf, NLEV_T, NLEV_P, seed=8)
    ivfs = IVFSepTP(sims, transf, cls_len, ftl, fel, fbl)
    fal = {'tt': ftl, 'ee': fel, 'bb': fbl}
    cls_ivfs = {'tt': ftl, 'ee': fel, 'bb': fbl, 'te': cls_len['te'] * ftl * fel}
    return cls_len, ivfs, fal, cls_ivfs


CLS_LEN, IVFS, FAL, CLS_IVFS = _setup()


@pytest.mark.slow
def test_sim_spectra():
    # simulated observed spectra match C_l b_l^2 + N_l
    t, e, b = IVFS.sim_lib.get_sim_teblm_batch(np.arange(12))
    clt = np.asarray(ualm.alm2cl(t, LMAX)).mean(axis=0)
    expected = CLS_LEN['tt'] + (NLEV_T / 60. / 180. * np.pi) ** 2
    ratio = clt[20:] / expected[20:]
    assert abs(ratio.mean() - 1.) < 0.05, ratio.mean()


@pytest.mark.parametrize('qe_key', [pytest.param('ptt', marks=pytest.mark.slow), 'p_p'])
def test_qe_spectrum_matches_n0(qe_key):
    qlib = QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX)
    qlms = np.asarray(qlib.get_sim_qlm_batch(qe_key, np.arange(NSIMS)))
    cls_q = np.asarray(ualm.alm2cl(qlms, LMAX)).mean(axis=0)
    NG = nhl.get_nhl(qe_key, qe_key, CLS_LEN, CLS_IVFS, LMAX, LMAX, lmax_out=LMAX)[0]
    sel = slice(10, 100)
    ratio = cls_q[sel] / NG[sel]
    # ~ Nmodes = NSIMS * sum(2L+1) >> 1; allow a few percent
    assert abs(ratio.mean() - 1.) < 0.05, (qe_key, ratio.mean())


@pytest.mark.slow
def test_qe_single_matches_batch():
    qlib = QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX)
    q0 = np.asarray(qlib.get_sim_qlm('ptt', 3))
    qb = np.asarray(qlib.get_sim_qlm_batch('ptt', np.array([2, 3])))
    assert np.allclose(q0, qb[1], rtol=1e-10, atol=1e-22)


def test_curl_key():
    qlib = QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX)
    x = np.asarray(qlib.get_sim_qlm('xtt', 1))
    NGxx = nhl.get_nhl('xtt', 'xtt', CLS_LEN, CLS_IVFS, LMAX, LMAX, lmax_out=LMAX)[1]
    cl = np.asarray(ualm.alm2cl(x, LMAX))
    ratio = cl[10:100] / NGxx[10:100]
    assert 0.5 < ratio.mean() < 2.0  # single sim: rough consistency


def test_mean_field_is_small():
    # full-sky isotropic filtering: MF vanishes up to MC noise ~ N0 / nsims
    qlib = QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX)
    mf = np.asarray(qlib.get_sim_qlm_mf('ptt', np.arange(NSIMS)))
    cl_mf = np.asarray(ualm.alm2cl(mf, LMAX))
    NG = nhl.get_nhl('ptt', 'ptt', CLS_LEN, CLS_IVFS, LMAX, LMAX, lmax_out=LMAX)[0]
    # MF spectrum should be ~ N0/NSIMS, not ~ N0
    assert np.mean(cl_mf[10:100] / NG[10:100]) < 3. / NSIMS


def test_composite_and_bh_keys():
    # p_te = pte + pet; ptt_bh_s = ptt - almxfl(stt, R^{ps}/R^{ss}); p_tp = ptt + p_p
    # (reference: plancklens/qest.py:168-181)
    from plancklens_tpu.models.qest import _almxfl
    resplib = qresp.RespLib(LMAX, CLS_LEN, CLS_LEN, FAL, LMAX)
    qlib = QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX, resplib=resplib)
    idxs = np.array([0, 1])
    assert np.allclose(np.asarray(qlib.get_sim_qlm_batch('p_te', idxs)),
                       np.asarray(qlib.get_sim_qlm_batch('pte', idxs)
                                  + qlib.get_sim_qlm_batch('pet', idxs)))
    assert np.allclose(np.asarray(qlib.get_sim_qlm('p_tp', 0)),
                       np.asarray(qlib.get_sim_qlm('ptt', 0))
                       + np.asarray(qlib.get_sim_qlm('p_p', 0)))
    wL = np.asarray(resplib.get_response('ptt', 's')) \
        * cli(np.asarray(resplib.get_response('stt', 's')))
    expected = np.asarray(qlib.get_sim_qlm('ptt', 0)) \
        - np.asarray(_almxfl(qlib.get_sim_qlm('stt', 0), wL))
    got = np.asarray(qlib.get_sim_qlm('ptt_bh_s', 0))
    assert np.allclose(got, expected)
    assert not np.allclose(got, np.asarray(qlib.get_sim_qlm('ptt', 0)))


def test_profiled_source_keys():
    # 'ntt' (noise, inverse-beam legs) and 'dtt' (profiled source) map estimators plus
    # their bias-hardened combinations (reference grammar: plancklens/qest.py:109-114,
    # map builder _get_sim_ntt qest.py:293-298; the reference ships no dtt builder).
    from plancklens_tpu.models.qest import _almxfl
    # reduced band limit: the algebraic identities under test are scale-free
    LM = 48
    fal = {k: v[:LM + 1] for k, v in FAL.items()}
    # with a unit beam the inverse-beam legs reduce to the point-source weights: the ntt
    # map must equal the stt map exactly
    unit = np.ones(LM + 1)
    qlib_u = QELib(IVFS, IVFS, CLS_LEN, LM, LM, transf=unit)
    assert np.allclose(np.asarray(qlib_u.get_sim_qlm('ntt', 0)),
                       np.asarray(qlib_u.get_sim_qlm('stt', 0)), rtol=1e-10, atol=1e-30)
    # non-trivial beam: s / n / d all distinct, bh combos follow the response algebra
    transf = np.exp(-0.5 * np.arange(LM + 1) * np.arange(1, LM + 2) * (2e-2) ** 2)
    resplib = qresp.RespLib(LM, CLS_LEN, CLS_LEN, fal, LM, transf=transf)
    qlib = QELib(IVFS, IVFS, CLS_LEN, LM, LM, resplib=resplib, transf=transf)
    ntt = np.asarray(qlib.get_sim_qlm('ntt', 0))
    dtt = np.asarray(qlib.get_sim_qlm('dtt', 0))
    stt = np.asarray(qlib.get_sim_qlm('stt', 0))
    assert not np.allclose(ntt, stt) and not np.allclose(dtt, stt)
    for kQE, ks in (('ptt', 'n'), ('ptt', 'd'), ('dtt', 'p'), ('ftt', 'd')):
        wL = np.asarray(resplib.get_response(kQE, ks)) \
            * cli(np.asarray(resplib.get_response(ks + 'tt', ks)))
        expected = np.asarray(qlib.get_sim_qlm(kQE, 0)) \
            - np.asarray(_almxfl(qlib.get_sim_qlm(ks + 'tt', 0), wL))
        got = np.asarray(qlib.get_sim_qlm('%s_bh_%s' % (kQE, ks), 0))
        assert np.allclose(got, expected), (kQE, ks)
        assert not np.allclose(got, np.asarray(qlib.get_sim_qlm(kQE, 0))), (kQE, ks)
    # the hardened estimator's response to the nuisance source must vanish
    for kQE, ks in (('ptt', 'n'), ('ptt', 'd')):
        R_bh = np.asarray(resplib.get_response('%s_bh_%s' % (kQE, ks), ks))
        R_raw = np.asarray(resplib.get_response(kQE, ks))
        sel = slice(2, LM + 1)
        assert np.max(np.abs(R_bh[sel])) < 1e-8 * np.max(np.abs(R_raw[sel])), (kQE, ks)


def test_qe_f32_engine_matches_f64():
    # production map-level precision: the f32 SHT engine (QELib(dtype=np.float32))
    # reproduces the f64 QE to f32 roundoff for both the pol and TT estimators
    for key in ('p_p', 'ptt'):
        q64 = np.asarray(QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX).get_sim_qlm(key, 0))
        q32 = np.asarray(QELib(IVFS, IVFS, CLS_LEN, LMAX, LMAX,
                               dtype=np.float32).get_sim_qlm(key, 0))
        rel = np.abs(q32 - q64).max() / np.abs(q64).max()
        assert rel < 3e-5, (key, rel)
