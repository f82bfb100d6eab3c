"""Band-power pipeline integration: Gaussian 'data' + sims, ds/ss legs, RDN0/MCN0, and
debiased band-powers consistent with zero lensing signal."""
import os
import types
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli
from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib
from plancklens_tpu.models.filt import IVFSepTP, IVFShuffle
from plancklens_tpu.models.qest import QELib
from plancklens_tpu.models.qecl import QeClLib
from plancklens_tpu.models.qresp import RespLib
from plancklens_tpu.models.nhl import NhlLib, get_nhl
from plancklens_tpu.models.n1 import N1Lib
from plancklens_tpu.models.bandpowers import Binner, get_blbubc

LMAX = 64
LMIN = 8
NVAR = 4


def _parfile():
    cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
    cls_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    transf = np.ones(LMAX + 1)
    nt2 = (35. / 60. / 180. * np.pi) ** 2
    np2 = 2 * nt2
    ftl = cli(cls_len['tt'] + nt2)
    fel = cli(cls_len['ee'] + np2)
    fbl = cli(cls_len['bb'] + np2)
    for fl in (ftl, fel, fbl):
        fl[:LMIN] = 0.
    cmb = CMBUnlLib(cls_len, LMAX, fields=('t', 'e', 'b'), seed=11)
    sims = MapsNlevLib(cmb, transf, 35., 35. * np.sqrt(2.), seed=12)
    ivfs = IVFSepTP(sims, transf, cls_len, ftl, fel, fbl)
    nsims = 64
    ivfs_d = IVFShuffle(ivfs, lambda i: -1)
    ivfs_s = IVFShuffle(ivfs, lambda i: (i + 1) % nsims)
    qlms_dd = QELib(ivfs, ivfs, cls_len, LMAX, LMAX)
    qlms_ds = QELib(ivfs, ivfs_d, cls_len, LMAX, LMAX)
    qlms_ss = QELib(ivfs, ivfs_s, cls_len, LMAX, LMAX)
    fal = {'tt': ftl, 'ee': fel, 'bb': fbl}
    pf = types.SimpleNamespace()
    pf.ivfs = ivfs
    pf.mc_sims_var = np.arange(NVAR)
    pf.mc_sims_bias = np.arange(NVAR, NVAR + 4)
    pf.qcls_dd = QeClLib(qlms_dd, qlms_dd, np.array([], dtype=int), lmax_qlm=LMAX)
    pf.qcls_ds = QeClLib(qlms_ds, qlms_ds, np.array([], dtype=int), lmax_qlm=LMAX)
    pf.qcls_ss = QeClLib(qlms_ss, qlms_ss, np.array([], dtype=int), lmax_qlm=LMAX)
    pf.qresp_dd = RespLib(LMAX, cls_len, cls_len, fal, LMAX)
    pf.nhl_dd = NhlLib(ivfs, cls_len, LMAX)
    pf.n1_dd = N1Lib(cls_len['tt'], cls_len['te'], cls_len['ee'], lmaxphi=128, dL=24)
    pf.cls_ivfs = {'tt': ftl, 'ee': fel, 'bb': fbl, 'te': cls_len['te'] * ftl * fel}
    pf.cls_len = cls_len
    return pf


PF = _parfile()


def test_blbubc_custom():
    bl, bu, bc = get_blbubc('8_25_45_64')
    assert np.all(bl == [8, 25, 45]) and np.all(bu == [24, 44, 64])


def test_rdn0_mcn0_vs_analytic():
    binner = Binner('ptt', 'ptt', PF, '8_25_45_64', lmaxphi=LMAX)
    mcn0 = binner.get_mcn0()
    rdn0 = binner.get_rdn0()
    NG = get_nhl('ptt', 'ptt', PF.cls_len, PF.cls_ivfs, LMAX, LMAX, lmax_out=LMAX)[0]
    ana = binner._get_binnedcl(cli(binner._qc_resp()) * NG)
    assert np.all(np.abs(mcn0 / ana - 1.) < 0.4), mcn0 / ana
    assert np.all(np.abs(rdn0 / ana - 1.) < 0.4), rdn0 / ana


def test_debiased_data_consistent_with_zero():
    # Gaussian skies carry no lensing: dat - RDN0 band-powers should be consistent with 0
    binner = Binner('ptt', 'ptt', PF, '8_25_45_64', lmaxphi=LMAX)
    dat = binner.get_dat_bandpowers()
    rdn0 = binner.get_rdn0()
    fid = binner.get_fid_bandpowers()
    # the debiased signal should be much smaller than the N0 scale
    n0scale = binner.get_mcn0()
    assert np.all(np.abs(dat - rdn0) < 0.75 * n0scale), (dat - rdn0) / n0scale


def test_semianalytic_nhl_of_data():
    binner = Binner('ptt', 'ptt', PF, '8_25_45_64', lmaxphi=LMAX)
    nhl_dat = binner.get_dat_nhl()
    mcn0 = binner.get_mcn0()
    assert np.all(np.abs(nhl_dat / mcn0 - 1.) < 0.5), nhl_dat / mcn0


def test_ps_and_mc_corrections():
    """Point-source 4-point pieces and additive/multiplicative MC corrections execute on
    the Gaussian fixture with sane magnitudes (no lensing: bmmc ~ 1, bamc ~ 0 within MC)."""
    binner = Binner('ptt', 'ptt', PF, '8_25_45_64', lmaxphi=LMAX)
    band_dat, band_check, band_syst, sim_stats, Cs2s2, pp_cl_ps = \
        binner.get_ps_data(lmin_ss_s4=10, lmax_ss_s4=LMAX)
    for v in (band_dat, band_check, band_syst):
        assert np.isfinite(v), (band_dat, band_check, band_syst)
    assert np.all(np.isfinite(pp_cl_ps))
    # data band is typical of the sim distribution (Gaussian fixture: no real sources)
    ssig = np.std(sim_stats)
    assert abs(band_dat - np.mean(sim_stats)) < 5 * ssig
    bamc, bamc_err = binner.get_bamc()
    assert np.all(np.isfinite(bamc)) and np.all(bamc_err > 0)
    bmmc = binner.get_bmmc()
    assert np.all(np.isfinite(bmmc))
    # additive and multiplicative corrections are two views of the same
    # <dd - 2ss> - prediction mean: bamc == (1/bmmc - 1) * fid up to the ss-split
    # (ss2 uses half the sims in get_bamc) and per-sim scatter
    implied = (1. / bmmc - 1.) * binner.fid_bandpowers
    assert np.all(np.abs(bamc - implied) < 5 * bamc_err + 0.3 * np.abs(implied)), \
        (bamc, implied, bamc_err)
    cov = binner.get_nhl_cov()
    assert cov.shape == (binner.nbins, binner.nbins)
    assert np.all(np.isfinite(cov)) and np.all(np.diag(cov) > 0)
