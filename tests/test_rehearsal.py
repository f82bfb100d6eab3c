"""Scaled Planck-2018 rehearsal: the strongest reproduction evidence obtainable without
the NERSC data products (docs/REPRODUCE.md points here).

Galactic-band mask + point-source holes + masked-noise inverse-variance weights +
actually-lensed skies, the full chain of the published analysis at reduced scale:
masked cinv filtering -> quadratic estimators -> split-half mean-field -> RDN0 / MCN0 /
N1 debiasing -> binned band-powers (reference bar: plancklens/README.md:57
exact-reproduction claim; plancklens/bandpowers.py:147-344).

Estimator choice. At a reduced band limit the TT estimator is sample-variance-blocked:
N0/C_L^pp ~ 5e3 at lmax 128 regardless of noise depth (measured with models.n0s.get_N0),
so no TT configuration this size can *detect* lensing in the auto-spectrum. The
polarisation estimator with deep pol noise is qualitatively better (N0/C_L^pp ~ 40-70
here), but even then a 16-sim auto-spectrum ensemble has ~1 sigma/bin of signal. The
rehearsal therefore asserts two complementary things:

  1. DETECTION + NORMALISATION from the reconstruction x input-phi cross-spectrum:
     each lensed sim's input phi is known, and the response-normalised cross-spectrum
     recovers C_L^pp per sim at ~5-10 % accuracy -- a 20-40 sigma per-bin statement
     that exercises masked cinv filtering, the QE, and the response normalisation
     end to end.

  2. CONSISTENCY of the auto-spectrum debias chain (MF, RDN0/MCN0, N1, binning):
     the identically-debiased MC ensemble recovers the input band-powers within its
     (shared-debiaser-aware) errors, RDN0 agrees with MCN0 at MC accuracy, the
     additive MC correction is consistent with zero, and the data realisation is a
     typical ensemble member (PTE).

Error budget for (2): the per-bin error combines the dd-ensemble scatter on the mean
with the *shared* MCN0 uncertainty (all sims are debiased by the same ss-ensemble mean,
so its MC error is a common offset the dd scatter does not see; empirically it moves
all bins coherently by ~1 sigma).

The point-source trispectrum correction is exercised in test_bandpowers.py; it is a
TT-channel 4-point and is identically zero for the pol-only estimator, so it is not
part of this chain.

Runtime: ~8 min cold on one CPU core (the cinv solves of 17 sims dominate). Set
PLK_CACHE_DIR to persist/reuse the products — a warm re-run takes ~20 s.
"""
import importlib.util
import os

import numpy as np
import pytest

LMAX = 128
NSIMS = 16
NLEV_T = 1.0     # uK-arcmin; deep-noise regime where pol lensing is detectable
NLEV_P = 1.4
KEY = 'p_p'


def _load_aniso():
    env = {'PLK_ANISO_LMAX': str(LMAX), 'PLK_ANISO_NSIMS': str(NSIMS),
           'PLK_ANISO_NLEV_T': str(NLEV_T), 'PLK_ANISO_NLEV_P': str(NLEV_P)}
    os.environ.update(env)
    try:
        spec = importlib.util.spec_from_file_location(
            'parfile_rehearsal',
            os.path.join(os.path.dirname(__file__), '..', 'params',
                         'anisofilt_example.py'))
        par = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(par)
    finally:
        for k in env:
            del os.environ[k]
    return par


@pytest.mark.slow
def test_planck_rehearsal_recovers_clpp():
    from plancklens_tpu.models.bandpowers import Binner, _load_fid_clpp
    from plancklens_tpu.models.qecl import stats
    from plancklens_tpu.utils import alm as ualm
    import jax.numpy as jnp

    par = _load_aniso()
    assert 0.5 < par.mask.mean() < 1.          # galactic band + holes actually cut
    lmax = par.lmax_qlm
    btype = '%d_%d_%d_%d' % (8, lmax // 3, 2 * lmax // 3, lmax)
    binner = Binner(KEY, KEY, par, btype, lmaxphi=lmax)
    nbins = binner.nbins

    # the full debias chain of the published analysis, at this scale
    rdn0 = np.asarray(binner.get_rdn0())
    mcn0 = np.asarray(binner.get_mcn0())
    n1 = np.asarray(binner.get_n1())
    fid = np.asarray(binner.get_fid_bandpowers())

    # ---- (1) detection + normalisation: reconstruction x input phi ---------------
    resp = np.asarray(par.qresp_dd.get_response(KEY, 'p'))
    fsky = float(par.qcls_dd.fsky12)
    fid_b = np.asarray(binner._get_binnedcl(_load_fid_clpp(lmax)[:lmax + 1]))
    st_x = stats(nbins)
    for idx in par.mc_sims_var:
        qlm = np.asarray(par.qlms_dd.get_sim_qlm(KEY, int(idx)))
        plm = np.asarray(par.cmb_len.get_sim_plm(int(idx)))
        cl_x = np.asarray(ualm.alm2cl(jnp.asarray(qlm).reshape((1, -1)), lmax,
                                      alm2=jnp.asarray(plm).reshape((1, -1))))[0]
        st_x.add(np.asarray(binner._get_binnedcl(
            (cl_x / np.maximum(resp * fsky, 1e-30))[:lmax + 1])) / fid_b)
    ratio, sig_x = st_x.mean(), st_x.sigmas_on_mean()
    # normalisation: response-normalised cross recovers the input spectrum per bin
    # (measured [1.00, 0.97, 0.87]; the last bin abuts the band limit)
    assert np.all(np.abs(ratio - 1.) < 0.2), ratio
    # and it is an unambiguous detection of lensing (measured 20-42 sigma per bin)
    assert np.all(ratio / sig_x > 10.), (ratio, sig_x)
    # the same statement through the library path: the parfile's qlms_x_in hook
    # (QeClLib over qecl.InputPlmLib) consumed by Binner.get_ampl_x_input — the
    # reference defines this hook but ships no in-tree wiring of it
    amp = binner.get_ampl_x_input(mc_sims=par.mc_sims_var)
    amp_mean, amp_sig = amp.mean(), amp.sigmas_on_mean()
    assert np.all(np.abs(amp_mean - 1.) < 0.25), amp_mean
    assert np.all(amp_mean / amp_sig > 10.), (amp_mean, amp_sig)

    # ---- (2) auto-spectrum debias-chain consistency ------------------------------
    # Monte-Carlo ensemble of identically-debiased sims: lensed with the fiducial
    # C_L^pp, so the ensemble mean must recover the input spectrum
    st = stats(nbins)
    st_ss = stats(nbins)
    for idx in par.mc_sims_var:
        dd = par.qcls_dd.get_sim_qcl(KEY, int(idx))
        st.add(binner._normed_bp(dd) - mcn0 - n1)
        ss = par.qcls_ss.get_sim_qcl(KEY, int(idx))
        st_ss.add(binner._normed_bp(2. * ss))
    mean, sig_mean = st.mean(), st.sigmas_on_mean()
    # shared-debiaser error: every sim is debiased by the same MCN0 estimate
    sig_tot = np.sqrt(sig_mean ** 2 + st_ss.sigmas_on_mean() ** 2)
    resid = mean - fid
    # recovery of the input lensing spectrum by the MC mean, bin by bin
    assert np.all(np.abs(resid) < 4. * sig_tot), \
        ('MC mean does not recover C_L^pp', resid / sig_tot)

    # the data realisation is a typical ensemble member under the *same* debiasing
    # (RDN0-debiasing the data but MCN0-debiasing the ensemble would mis-calibrate
    # the PTE: RDN0 removes most of the realisation's disconnected fluctuation)
    bp_dat_c = np.asarray(binner._normed_bp(par.qcls_dd.get_sim_qcl(KEY, -1))) \
        - mcn0 - n1
    pte = st.get_chisq_pte(bp_dat_c)
    assert 1e-3 < pte < 1. - 1e-3, pte

    # debiaser cross-checks at this scale: RDN0 and MCN0 agree to MC accuracy
    assert np.all(np.abs(rdn0 - mcn0) < 5. * np.sqrt(2.) * st_ss.sigmas()), \
        (rdn0, mcn0)
    # additive MC correction consistent with zero (no unmodelled bias beyond MC noise)
    bamc_mean, bamc_err = binner.get_bamc()
    assert np.all(np.abs(np.asarray(bamc_mean)) < 4. * np.asarray(bamc_err)), \
        (bamc_mean, bamc_err)
