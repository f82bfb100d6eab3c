"""Scaled Planck-2018 rehearsal: the strongest reproduction evidence obtainable without
the NERSC data products (docs/REPRODUCE.md points here).

Galactic-band mask + point-source holes + inhomogeneous (masked) noise + actually-lensed
skies, the full chain of the published analysis at reduced scale: masked cinv filtering
-> quadratic estimators -> split-half mean-field -> RDN0 / N1 debiasing -> point-source
and multiplicative MC corrections -> binned band-powers — asserting the debiased spectrum
recovers the input C_L^pp within its Monte-Carlo errors, with a sane data PTE
(reference bar: plancklens/README.md:57 exact-reproduction claim;
plancklens/bandpowers.py:147-344 assembly).
"""
import importlib.util
import os

import numpy as np
import pytest

LMAX = 128
NSIMS = 16


def _load_aniso():
    os.environ['PLK_ANISO_LMAX'] = str(LMAX)
    os.environ['PLK_ANISO_NSIMS'] = str(NSIMS)
    try:
        spec = importlib.util.spec_from_file_location(
            'parfile_rehearsal',
            os.path.join(os.path.dirname(__file__), '..', 'params',
                         'anisofilt_example.py'))
        par = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(par)
    finally:
        del os.environ['PLK_ANISO_LMAX'], os.environ['PLK_ANISO_NSIMS']
    return par


@pytest.mark.slow
def test_planck_rehearsal_recovers_clpp():
    from plancklens_tpu.models.bandpowers import Binner
    from plancklens_tpu.models.qecl import stats

    par = _load_aniso()
    assert 0.5 < par.mask.mean() < 1.          # galactic band + holes actually cut
    lmax = par.lmax_qlm
    btype = '%d_%d_%d_%d' % (8, lmax // 3, 2 * lmax // 3, lmax)
    binner = Binner('ptt', 'ptt', par, btype, lmaxphi=lmax)
    nbins = binner.nbins

    # the full debias chain of the published analysis, at this scale
    dat = np.asarray(binner.get_dat_bandpowers())
    rdn0 = np.asarray(binner.get_rdn0())
    mcn0 = np.asarray(binner.get_mcn0())
    n1 = np.asarray(binner.get_n1())
    ps = np.asarray(binner.get_ps_corr(lmin_ss_s4=10, lmax_ss_s4=lmax))
    fid = np.asarray(binner.get_fid_bandpowers())
    bp_dat = dat - rdn0 - n1 - ps

    # Monte-Carlo ensemble of identically-debiased sims: lensed with the fiducial
    # C_L^pp, so the ensemble mean must recover the input spectrum
    st = stats(nbins)
    for idx in par.mc_sims_var:
        dd = par.qcls_dd.get_sim_qcl('ptt', int(idx))
        st.add(binner._normed_bp(dd) - mcn0 - n1 - ps)
    mean, sig_mean = st.mean(), st.sigmas_on_mean()
    resid = mean - fid
    # recovery of the input lensing spectrum by the MC mean, bin by bin
    assert np.all(np.abs(resid) < 4. * sig_mean), \
        ('MC mean does not recover C_L^pp', resid / sig_mean)
    # and it is a detection, not a null: the signal bins carry the fiducial power
    assert np.all(mean[:-1] > 0.), mean

    # the data realisation is a typical member of the ensemble
    pte = st.get_chisq_pte(bp_dat)
    assert 1e-3 < pte < 1. - 1e-3, pte

    # debiaser cross-checks at this scale: RDN0 and MCN0 agree to MC accuracy
    assert np.all(np.abs(rdn0 / mcn0 - 1.) < 0.5), rdn0 / mcn0
    # multiplicative MC correction is O(1)
    bmmc = np.asarray(binner.get_bmmc())
    assert np.all(np.abs(bmmc - 1.) < 0.5), bmmc
