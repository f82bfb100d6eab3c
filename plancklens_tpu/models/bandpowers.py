r"""Band-power construction (reference: plancklens/bandpowers.py).

ffp10-style binner: fiducial-C_L^kk-weighted bins, data band-powers, MCN0 (2<ss>), RDN0
(4<ds> - 2<ss>), semi-analytic N0, analytic N1, point-source correction, additive and
multiplicative MC corrections, covariance matrices, and cross-to-input amplitude.

The `parfile` argument is any namespace carrying the pipeline libraries (the reference uses
an imported parameter-file module; a types.SimpleNamespace or dataclass works here):
  qcls_dd, qcls_ds, qcls_ss  -- QeClLib instances (data x data, data x sim, sim x sim legs)
  qresp_dd                   -- RespLib
  nhl_dd                     -- NhlLib (semi-analytic covariance); optional
  n1_dd                      -- N1Lib; optional
  ivfs                       -- filtering library (for N1/PS filter arrays)
  mc_sims_var, mc_sims_bias  -- sim index arrays
  qlms_x_in                  -- cross-to-input spectra library; optional
"""
import os
import numpy as np

import plancklens_tpu
from ..utils.cls import camb_clfile, cli
from .qecl import stats
from . import nhl as nhl_mod


def get_blbubc(bin_type):
    """Bin edge definitions (reference: plancklens/bandpowers.py:14-40)."""
    if bin_type == 'consext8':
        bins_l = np.array([8, 41, 85, 130, 175, 220, 265, 310, 355])
        bins_u = np.array([40, 84, 129, 174, 219, 264, 309, 354, 400])
    elif bin_type == 'agr2':
        bins_l = np.array([8, 21, 40, 66, 101, 145, 199, 264, 339, 426, 526, 638, 763, 902])
        bins_u = np.array([20, 39, 65, 100, 144, 198, 263, 338, 425, 525, 637, 762, 901, 2048])
    elif bin_type == 'xdip':
        bins_l = np.array([8, 264, 902])
        bins_u = np.array([263, 901, 2048])
    elif bin_type == 'pdip':
        bins_l = np.array([8, 101, 426])
        bins_u = np.array([100, 425, 2048])
    elif bin_type == 'lowl':
        bins_l = np.array([2, 7])
        bins_u = np.array([8, 40])
    elif bin_type == '1_10_unb':
        bins_l = np.arange(1, 11)
        bins_u = bins_l
    elif '_' in bin_type:
        edges = np.array(bin_type.split('_'), dtype=int)
        bins_l = edges[:-1]
        bins_u = edges[1:] - 1
        bins_u[-1] += 1
    else:
        assert 0, bin_type + ' not implemented'
    return bins_l, bins_u, 0.5 * (bins_l + bins_u)


class Binner:
    """FFP10-cosmology band-power builder (reference: plancklens/bandpowers.py:43-360)."""

    def __init__(self, k1, k2, parfile, btype, ksource='p', lmaxphi=2048):
        cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
        if ksource == 'p':
            ls = np.arange(lmaxphi + 1, dtype=float)
            kswitch = (ls * (ls + 1.)) ** 2 / (2. * np.pi) * 1e7
            if k1[0] == 'p' and k2[0] == 'p':
                clpp_fid = camb_clfile(os.path.join(
                    cls_path, 'FFP10_wdipole_lenspotentialCls.dat'))['pp'][:lmaxphi + 1]
            elif k1[0] == 'x' and k2[0] == 'x':
                clpp_fid = np.ones(lmaxphi + 1, dtype=float)
            else:
                assert 0, 'not implemented'
        else:
            kswitch = np.ones(lmaxphi + 1, dtype=float)
            clpp_fid = np.ones(lmaxphi + 1, dtype=float)
        clkk_fid = clpp_fid * kswitch
        qc_resp = (parfile.qresp_dd.get_response(k1, ksource)[:lmaxphi + 1]
                   * parfile.qresp_dd.get_response(k2, ksource)[:lmaxphi + 1])
        bin_lmins, bin_lmaxs, bin_centers = get_blbubc(btype)
        vlpp_inv = qc_resp * (2 * np.arange(lmaxphi + 1) + 1) \
            * (0.5 * getattr(parfile.qcls_dd, 'fsky1234', 1.))
        vlpp_inv *= cli(kswitch) ** 2
        vlpp_den = [np.sum(clkk_fid[lmin:lmax + 1] ** 2 * vlpp_inv[lmin:lmax + 1])
                    for lmin, lmax in zip(bin_lmins, bin_lmaxs)]
        fid_bandpowers = np.ones(len(bin_centers))

        def _bil(i, L):
            ret = (fid_bandpowers[i] / vlpp_den[i]) * vlpp_inv[L] * clkk_fid[L] * kswitch[L]
            return ret * (L >= bin_lmins[i]) * (L <= bin_lmaxs[i])

        lav = np.zeros(len(bin_centers))
        for i, (lmin, lmax) in enumerate(zip(bin_lmins, bin_lmaxs)):
            w_lav = 1. / np.arange(lmin, lmax + 1) ** 2 / np.arange(lmin + 1, lmax + 2) ** 2
            Ls = np.arange(lmin, lmax + 1)
            lav[i] = np.sum(Ls * w_lav * _bil(i, Ls)) / np.sum(w_lav * _bil(i, Ls))

        self.k1, self.k2, self.ksource, self.parfile = k1, k2, ksource, parfile
        self.fid_bandpowers = np.interp(lav, np.arange(lmaxphi + 1, dtype=float), clkk_fid)
        self.bin_lmins, self.bin_lmaxs, self.bin_lavs = bin_lmins, bin_lmaxs, lav
        self.nbins = len(bin_centers)
        self.vlpp_den, self.vlpp_inv = vlpp_den, vlpp_inv
        self.clkk_fid, self.kswitch = clkk_fid, kswitch
        self.cls_path = cls_path
        self.lmaxphi = lmaxphi

    def _get_bil(self, i, L):
        ret = (self.fid_bandpowers[i] / self.vlpp_den[i]) * self.vlpp_inv[L] \
            * self.clkk_fid[L] * self.kswitch[L]
        return ret * (L >= self.bin_lmins[i]) * (L <= self.bin_lmaxs[i])

    def _get_binnedcl(self, cl):
        assert len(cl) > self.bin_lmaxs[-1], (len(cl), self.bin_lmaxs[-1])
        ret = np.zeros(self.nbins)
        for i, (lmin, lmax) in enumerate(zip(self.bin_lmins, self.bin_lmaxs)):
            ret[i] = np.sum(self._get_bil(i, np.arange(lmin, lmax + 1)) * cl[lmin:lmax + 1])
        return ret

    def _qc_resp(self, k1=None, k2=None):
        k1 = self.k1 if k1 is None else k1
        k2 = self.k2 if k2 is None else k2
        return (self.parfile.qresp_dd.get_response(k1, self.ksource)
                * self.parfile.qresp_dd.get_response(k2, self.ksource))

    def get_fid_bandpowers(self):
        return np.copy(self.fid_bandpowers)

    def get_dat_bandpowers(self):
        """Raw data band-powers, before bias subtraction."""
        return self._get_binnedcl(cli(self._qc_resp())
                                  * self.parfile.qcls_dd.get_sim_qcl(self.k1, -1, k2=self.k2))

    def get_mcn0(self):
        """Monte-Carlo N0: 2 <ss> (reference: bandpowers.py:154-160)."""
        ss = self.parfile.qcls_ss.get_sim_stats_qcl(self.k1, self.parfile.mc_sims_var,
                                                    k2=self.k2).mean()
        return self._get_binnedcl(cli(self._qc_resp()) * 2. * ss)

    def get_rdn0(self):
        """Realisation-dependent N0: 4 <ds> - 2 <ss> (reference: bandpowers.py:162-169)."""
        ds = self.parfile.qcls_ds.get_sim_stats_qcl(self.k1, self.parfile.mc_sims_var,
                                                    k2=self.k2).mean()
        ss = self.parfile.qcls_ss.get_sim_stats_qcl(self.k1, self.parfile.mc_sims_var,
                                                    k2=self.k2).mean()
        return self._get_binnedcl(cli(self._qc_resp()) * (4. * ds - 2. * ss))

    def get_dat_nhl(self):
        """Semi-analytic N0 of the data realisation."""
        return self._get_binnedcl(cli(self._qc_resp())
                                  * self.parfile.nhl_dd.get_sim_nhl(-1, self.k1, self.k2))

    def get_n1(self, k1=None, k2=None, unnormed=False):
        """Analytic N1 bias (reference: bandpowers.py:180-210)."""
        k1 = self.k1 if k1 is None else k1
        k2 = self.k2 if k2 is None else k2
        assert k1 == k2, 'check signs for QEs of different spins'
        assert self.ksource[0] == 'p', 'check aniso source spectrum'
        ivfs = self.parfile.ivfs
        ftl, fel, fbl = ivfs.get_ftl(), ivfs.get_fel(), ivfs.get_fbl()
        clpp_fid = camb_clfile(os.path.join(self.cls_path,
                                            'FFP10_wdipole_lenspotentialCls.dat'))['pp']
        qc_resp = self._qc_resp(k1, k2)
        n1pp = self.parfile.n1_dd.get_n1(k1, self.ksource, clpp_fid, ftl, fel, fbl,
                                         len(qc_resp) - 1, kB=k2)
        return self._get_binnedcl(cli(qc_resp) * n1pp) if not unnormed else n1pp

    def get_ps_data(self, lmin_ss_s4=100, lmax_ss_s4=2048, mc_sims_ss=None, mc_sims_ds=None):
        """Point-source 4-point amplitude pieces (reference: bandpowers.py:212-269)."""
        ks4 = 'stt'
        twolpo = 2 * np.arange(lmax_ss_s4 + 1) + 1.
        pf = self.parfile
        dd = pf.qcls_dd.get_sim_stats_qcl(ks4, pf.mc_sims_var).mean()[:lmax_ss_s4 + 1]
        ds = pf.qcls_ds.get_sim_stats_qcl(
            ks4, pf.mc_sims_bias if mc_sims_ds is None else mc_sims_ds).mean()[:lmax_ss_s4 + 1]
        ss = pf.qcls_ss.get_sim_stats_qcl(
            ks4, pf.mc_sims_bias if mc_sims_ss is None else mc_sims_ss).mean()[:lmax_ss_s4 + 1]
        dat = pf.qcls_dd.get_sim_qcl(ks4, -1)[:lmax_ss_s4 + 1]
        ftl = pf.ivfs.get_ftl()
        qc_resp_ptsrc = nhl_mod.get_nhl(ks4, ks4, {}, {'tt': ftl}, len(ftl) - 1,
                                        len(ftl) - 1, lmax_out=lmax_ss_s4)[0] ** 2
        norm = 4.0 / np.sum(4.0 * twolpo[lmin_ss_s4:lmax_ss_s4 + 1]
                            * qc_resp_ptsrc[lmin_ss_s4:lmax_ss_s4 + 1])
        s4_cl_dat = norm * twolpo * (dat - 4. * ds + 2. * ss)
        s4_cl_check = norm * twolpo * (dd - 2. * ss)
        s4_cl_systs = norm * twolpo * (4. * ds - 4. * ss)
        clpp_fid = camb_clfile(os.path.join(self.cls_path,
                                            'FFP10_wdipole_lenspotentialCls.dat'))['pp']
        s4_cl_n1 = norm * twolpo * self.get_n1(k1=ks4, k2=ks4, unnormed=True)[:lmax_ss_s4 + 1]
        s4_cl_prim = norm * twolpo * pf.qresp_dd.get_response(ks4, self.ksource)[
            :lmax_ss_s4 + 1] ** 2 * clpp_fid[:lmax_ss_s4 + 1]
        band_dat = np.sum((s4_cl_dat - s4_cl_prim - s4_cl_n1)[lmin_ss_s4:lmax_ss_s4 + 1])
        band_check = np.sum((s4_cl_check - s4_cl_prim - s4_cl_n1)[lmin_ss_s4:lmax_ss_s4 + 1])
        band_syst = np.abs(np.sum(s4_cl_systs[lmin_ss_s4:lmax_ss_s4 + 1]))
        Cs2s2 = (s4_cl_dat - s4_cl_prim - s4_cl_n1) * cli(twolpo) / norm
        Cs2s2 *= cli(qc_resp_ptsrc[:lmax_ss_s4 + 1])
        sim_stats = []
        for idx in pf.mc_sims_var:
            ts4 = norm * twolpo[:lmax_ss_s4 + 1] \
                * (pf.qcls_dd.get_sim_qcl(ks4, int(idx))[:lmax_ss_s4 + 1] - 2. * ss)
            sim_stats.append(np.sum((ts4 - s4_cl_prim - s4_cl_n1)[lmin_ss_s4:lmax_ss_s4 + 1]))
        qlss = (pf.qresp_dd.get_response(ks4, self.k1[0])
                * pf.qresp_dd.get_response(ks4, self.k2[0]))
        pp_cl_ps = band_dat * cli(self._qc_resp()) * qlss
        return band_dat, band_check, band_syst, sim_stats, Cs2s2, pp_cl_ps

    def get_ps_corr(self, lmin_ss_s4=100, lmax_ss_s4=2048):
        """Binned point-source correction."""
        return self._get_binnedcl(self.get_ps_data(lmin_ss_s4=lmin_ss_s4,
                                                   lmax_ss_s4=lmax_ss_s4)[-1])

    def get_bamc(self, wn1=True):
        """Additive MC correction with approximate errors (reference: bandpowers.py:277-301)."""
        assert self.k1[0] == 'p' and self.k2[0] == 'p' and self.ksource == 'p'
        pf = self.parfile
        ss2 = 2 * pf.qcls_ss.get_sim_stats_qcl(self.k1, pf.mc_sims_var, k2=self.k2).mean()
        cl_pred = camb_clfile(os.path.join(self.cls_path,
                                           'FFP10_wdipole_lenspotentialCls.dat'))['pp'][:len(ss2)]
        qc_norm = cli(self._qc_resp())
        bp_stats = stats(self.nbins)
        bp_n1 = self.get_n1() if wn1 else np.zeros(self.nbins)
        for idx in pf.mc_sims_var:
            dd = pf.qcls_dd.get_sim_qcl(self.k1, int(idx), k2=self.k2)
            bp_stats.add(self._get_binnedcl(qc_norm * (dd - ss2) - cl_pred) - bp_n1)
        NMF = len(pf.qcls_dd.mc_sims_mf)
        NMF = NMF if NMF else np.inf
        NB = len(pf.mc_sims_var)
        return bp_stats.mean(), bp_stats.sigmas_on_mean() * np.sqrt(
            (1. + 1. + 2. / NMF + 2 * NB / float(NMF * NMF)))

    def get_bmmc(self, mc_sims_dd=None, mc_sims_ss=None, wN1=True):
        """Multiplicative MC correction (reference: bandpowers.py:303-318)."""
        assert self.k1[0] == 'p' and self.k2[0] == 'p' and self.ksource == 'p'
        pf = self.parfile
        if mc_sims_dd is None:
            mc_sims_dd = pf.mc_sims_var
        if mc_sims_ss is None:
            mc_sims_ss = pf.mc_sims_var
        dd = pf.qcls_dd.get_sim_stats_qcl(self.k1, mc_sims_dd, k2=self.k2).mean()
        ss = pf.qcls_ss.get_sim_stats_qcl(self.k1, mc_sims_ss, k2=self.k2).mean()
        cl_pred = camb_clfile(os.path.join(self.cls_path,
                                           'FFP10_wdipole_lenspotentialCls.dat'))['pp']
        bps = self._get_binnedcl(cli(self._qc_resp()) * (dd - 2 * ss) - cl_pred[:len(dd)])
        if wN1:
            bps = bps - self.get_n1()
        return 1. / (1 + bps / self.fid_bandpowers)

    def get_nhl_cov(self, mc_sims_dd=None):
        """Covariance from the semi-analytic N0 debiaser (reference: bandpowers.py:320-331)."""
        if mc_sims_dd is None:
            mc_sims_dd = self.parfile.mc_sims_var
        cov_stats = stats(self.nbins)
        qc_norm = cli(self._qc_resp())
        for idx in mc_sims_dd:
            dd = self.parfile.qcls_dd.get_sim_qcl(self.k1, int(idx), k2=self.k2)
            cov_stats.add(self._get_binnedcl(
                qc_norm * (dd - self.parfile.nhl_dd.get_sim_nhl(int(idx), self.k1, self.k2))))
        return cov_stats.cov()

    def get_mcn0_cov(self, mc_sims_dd=None):
        """Covariance from the realisation-independent debiaser."""
        if mc_sims_dd is None:
            mc_sims_dd = self.parfile.mc_sims_var
        cov_stats = stats(self.nbins)
        qc_norm = cli(self._qc_resp())
        for idx in mc_sims_dd:
            dd = self.parfile.qcls_dd.get_sim_qcl(self.k1, int(idx), k2=self.k2)
            cov_stats.add(self._get_binnedcl(qc_norm * dd))
        return cov_stats.cov()

    def get_ampl_x_input(self, mc_sims=None):
        """Cross-correlation amplitude to the input lensing maps."""
        qlmi = self.parfile.qlms_x_in
        if mc_sims is None:
            mc_sims = np.unique(np.concatenate([self.parfile.mc_sims_var,
                                                self.parfile.mc_sims_bias]))
        xin = stats(self.nbins)
        qnorm = cli(self.parfile.qresp_dd.get_response(self.k1, self.ksource))
        for idx in mc_sims:
            qi = qlmi.get_sim_qcl(self.k1, int(idx))
            xin.add(self._get_binnedcl(qnorm * qi) / self.fid_bandpowers)
        return xin
