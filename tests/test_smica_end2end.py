"""Synthetic-FITS end-to-end of the production smica parameter file.

The reference's production config (reference: params/smicadx12_planck2018.py,
plancklens/sims/planck2018_sims.py:22-71) consumes NERSC data products that cannot
exist in this environment. This test runs the *actual parfile code path* on
reduced-scale synthetic products written in the same on-disk formats:

  * healpy-format alm FITS files (utils.fitsio.write_alm) holding beam-convolved
    lensed CMB alms + harmonic white noise, for sims 0..nsims-1 and the 'dat' index;
  * noise-free input phi alms per sim, for the cross-spectrum check;
  * a RING-ordered HEALPix lensing mask FITS (galactic band + point-source holes)
    that the parfile resamples onto its ring solver grid (resample_to_rings).

With $PLK_PLANCK_DATA pointed at these, the parfile's own wiring executes end to
end: ExternalAlmLib -> AlmMapLib observed skies -> masked CinvT/CinvP CG filtering
-> isotropic rescaling -> QE -> split-half mean-field -> ds/ss shuffled legs ->
RDN0/MCN0/N1 debiasing -> binned band-powers, and the reconstruction is checked
against the known input phi of each sim (detection + normalisation) and against
the input lensing spectrum (debias-chain consistency), as in test_rehearsal.py.

Runtime: ~2-4 min cold on one CPU core (cinv solves of 11 sims x 2 channels
dominate); PLK_CACHE_DIR persists the products for warm re-runs.
"""
import importlib.util
import os

import numpy as np
import pytest

LMAX = 64          # lmax_ivf of the shrunken config (production: 2048)
NSIDE = 32         # healpix resolution of the synthetic mask (production: 2048)
NSIMS = 10
NLEV_T = 1.0       # uK-arcmin; deep-noise regime where pol lensing is detectable
NLEV_P = 1.4
KEY = 'p_p'
SEED = 7


class _LenAlms:
    """Harmonic view of CMBLenLib's lensed skies (exact re-analysis on the GL grid)."""

    def __init__(self, cmb_len):
        self.c = cmb_len
        self._pcache = {}

    def hashdict(self):
        return {'lensed': self.c.hashdict()}

    def get_sim_tlm(self, idx):
        return self.c.sht.map2alm(self.c.get_sim_tmap(idx))

    def _eb(self, idx):
        if idx not in self._pcache:
            q, u = self.c.get_sim_pmap(idx)
            self._pcache = {idx: self.c.sht.map2alm_spin((q, u), 2)}
        return self._pcache[idx]

    def get_sim_elm(self, idx):
        return self._eb(idx)[0]

    def get_sim_blm(self, idx):
        return self._eb(idx)[1]


def _write_products(tdir):
    """Synthetic Planck-like products in the reference's on-disk formats."""
    import plancklens_tpu
    from plancklens_tpu.utils import camb_clfile
    from plancklens_tpu.utils.fitsio import write_alm, write_map
    from plancklens_tpu.models.n0s import gauss_beam
    from plancklens_tpu.models.sims import CMBLenLib, AlmNlevLib
    from plancklens_tpu.ops.sht import gl_geometry
    from plancklens_tpu.ops.sht.healpix import HealpixGeometry, pixwin

    cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
    cl_unl = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lenspotentialCls.dat'))
    # must match the parfile's transfer at this scale: 5' beam x nside pixel window
    transf = gauss_beam(5., lmax=LMAX) * pixwin(NSIDE, LMAX)

    gen_geom = gl_geometry(LMAX + 16)
    cmb_len = CMBLenLib(cl_unl, LMAX, gen_geom, seed=SEED, dlmax=16)
    obs = AlmNlevLib(_LenAlms(cmb_len), LMAX, transf, NLEV_T, NLEV_P, seed=3000)

    smica = os.path.join(tdir, 'smica_dx12')
    os.makedirs(smica, exist_ok=True)
    for i in range(NSIMS + 1):
        tag = 'dat' if i == NSIMS else '%04d' % i     # the extra realisation is 'data'
        write_alm(os.path.join(smica, 'sim_tlm_%s.fits' % tag),
                  np.asarray(obs.get_sim_tlm(i)))
        write_alm(os.path.join(smica, 'sim_elm_%s.fits' % tag),
                  np.asarray(obs.get_sim_elm(i)))
        write_alm(os.path.join(smica, 'sim_blm_%s.fits' % tag),
                  np.asarray(obs.get_sim_blm(i)))
        write_alm(os.path.join(smica, 'sim_plm_%s.fits' % tag),
                  np.asarray(cmb_len.get_sim_plm(i)))

    # RING-ordered healpix mask: galactic band + two point-source holes
    hg = HealpixGeometry(NSIDE)
    z = np.concatenate([np.full(n, zr) for zr, n in zip(np.cos(hg.theta), hg.nphi)])
    phi = np.concatenate([p0 + 2. * np.pi * np.arange(n) / n
                          for p0, n in zip(hg.phi0, hg.nphi)])
    mask = (np.abs(z) > 0.15).astype(float)
    for zc, pc, r in ((0.6, 1.0, 0.08), (-0.5, 4.0, 0.06)):
        mask *= ((z - zc) ** 2 + (np.cos(phi) - np.cos(pc)) ** 2 * (1 - z ** 2)
                 + (np.sin(phi) - np.sin(pc)) ** 2 * (1 - z ** 2) > r ** 2)
    write_map(os.path.join(tdir, 'lensing_mask.fits'), mask, nside=NSIDE)
    return cmb_len


def _load_parfile(tdir):
    env = {'PLK_PLANCK_DATA': tdir,
           'PLK_SMICA_LMAX': str(LMAX), 'PLK_SMICA_NSIDE': str(NSIDE),
           'PLK_SMICA_NSIMS': str(NSIMS),
           'PLK_SMICA_NLEV_T': str(NLEV_T), 'PLK_SMICA_NLEV_P': str(NLEV_P)}
    os.environ.update(env)
    try:
        spec = importlib.util.spec_from_file_location(
            'parfile_smica_synth',
            os.path.join(os.path.dirname(__file__), '..', 'params',
                         'smica_dx12_planck2018.py'))
        par = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(par)
    finally:
        for k in env:
            del os.environ[k]
    return par


@pytest.mark.slow
def test_smica_parfile_end2end(tmp_path):
    from plancklens_tpu.models.bandpowers import Binner, _load_fid_clpp
    from plancklens_tpu.models.qecl import stats
    from plancklens_tpu.utils import alm as ualm
    import jax.numpy as jnp

    cmb_len = _write_products(str(tmp_path))
    par = _load_parfile(str(tmp_path))

    # the mask actually cuts, and survived the FITS + resample round trip
    ring_mask = np.asarray(par.cinv_t.filt.ninv) > 0
    assert 0.5 < ring_mask.mean() < 0.95, ring_mask.mean()

    # masked cinv filtering through the parfile's own wiring (incl. the lmin cut)
    tlm0 = np.asarray(par.ivfs.get_sim_tlm(0))
    elm0 = np.asarray(par.ivfs.get_sim_elm(0))
    assert np.all(np.isfinite(tlm0)) and np.abs(tlm0).max() > 0.
    ls, _ = ualm._lm_indices(par.lmax_ivf)
    assert np.all(tlm0[ls < par.lmin_ivf] == 0.) and np.all(np.abs(elm0)[ls >= 2].max() > 0.)

    lmax = par.lmax_qlm
    btype = '%d_%d_%d_%d' % (8, lmax // 3, 2 * lmax // 3, lmax)
    binner = Binner(KEY, KEY, par, btype, lmaxphi=lmax)
    nbins = binner.nbins

    rdn0 = np.asarray(binner.get_rdn0())       # exercises the ds + ss shuffled legs
    mcn0 = np.asarray(binner.get_mcn0())
    n1 = np.asarray(binner.get_n1())
    fid = np.asarray(binner.get_fid_bandpowers())

    # ---- detection + normalisation: reconstruction x the known input phi ---------
    # binned within the band limit of the written phi products (LMAX): above it the
    # cross is identically zero by construction
    btype_x = '%d_%d_%d_%d' % (8, LMAX // 3, 2 * LMAX // 3, LMAX)
    binner_x = Binner(KEY, KEY, par, btype_x, lmaxphi=LMAX)
    resp = np.asarray(par.qresp_dd.get_response(KEY, 'p'))
    fsky = float(par.qcls_dd.fsky12)
    fid_b = np.asarray(binner_x._get_binnedcl(_load_fid_clpp(LMAX)[:LMAX + 1]))
    st_x = stats(binner_x.nbins)
    for idx in par.mc_sims_var:
        qlm = np.asarray(par.qlms_dd.get_sim_qlm(KEY, int(idx)))
        plm = np.asarray(par.sims_alm.get_sim_plm(int(idx)))    # read back from FITS
        plm = np.asarray(ualm.alm_copy(jnp.asarray(plm), cmb_len.lmax, lmax))
        cl_x = np.asarray(ualm.alm2cl(jnp.asarray(qlm).reshape((1, -1)), lmax,
                                      alm2=jnp.asarray(plm).reshape((1, -1))))[0]
        st_x.add(np.asarray(binner_x._get_binnedcl(
            (cl_x / np.maximum(resp * fsky, 1e-30))[:LMAX + 1])) / fid_b)
    ratio, sig_x = st_x.mean(), st_x.sigmas_on_mean()
    # normalisation: the response-normalised cross recovers the input spectrum
    assert np.all(np.abs(ratio - 1.) < 0.3), ratio
    # and lensing is detected through the production wiring
    assert np.all(ratio / sig_x > 4.), (ratio, sig_x)
    # the same statement through the parfile's qlms_x_in hook (InputPlmLib reading
    # the sim_plm FITS products) and Binner.get_ampl_x_input
    amp = binner_x.get_ampl_x_input(mc_sims=par.mc_sims_var)
    assert np.all(np.abs(amp.mean() - 1.) < 0.3), amp.mean()

    # ---- auto-spectrum debias-chain consistency ----------------------------------
    st = stats(nbins)
    st_ss = stats(nbins)
    for idx in par.mc_sims_var:
        dd = par.qcls_dd.get_sim_qcl(KEY, int(idx))
        st.add(binner._normed_bp(dd) - mcn0 - n1)
        ss = par.qcls_ss.get_sim_qcl(KEY, int(idx))
        st_ss.add(binner._normed_bp(2. * ss))
    mean = st.mean()
    sig_tot = np.sqrt(st.sigmas_on_mean() ** 2 + st_ss.sigmas_on_mean() ** 2)
    assert np.all(np.abs(mean - fid) < 5. * sig_tot), ((mean - fid) / sig_tot)
    # RDN0 (4ds - 2ss, data leg = the 'dat' FITS files) agrees with MCN0 at MC accuracy
    assert np.all(np.abs(rdn0 - mcn0) < 6. * np.sqrt(2.) * st_ss.sigmas()), (rdn0, mcn0)

    # the 'data' realisation is a typical ensemble member under the same debiasing
    bp_dat = np.asarray(binner._normed_bp(par.qcls_dd.get_sim_qcl(KEY, -1))) - mcn0 - n1
    pte = st.get_chisq_pte(bp_dat)
    assert 1e-3 < pte < 1. - 1e-3, pte
