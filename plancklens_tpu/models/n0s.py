r"""Convenience forecast API: reconstruction noise curves for the standard estimators.

Equivalent of the reference's get_N0 (reference: plancklens/n0s.py:30-206): given a beam
and noise levels, returns normalised N0 curves for the T-only, P-only and (G)MV versions of
a source estimator, with independent or joint T/P filtering.
"""
import os
import numpy as np

import plancklens_tpu
from ..utils.cls import camb_clfile, cli, cls_dot, cl_inverse
from . import nhl, qresp


def gauss_beam(fwhm_amin, lmax):
    ls = np.arange(lmax + 1)
    sigma2 = (fwhm_amin / 60. / 180. * np.pi / np.sqrt(8. * np.log(2.))) ** 2
    return np.exp(-0.5 * ls * (ls + 1) * sigma2)


def _default_cls(lmax=None):
    return camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lensedCls.dat'), lmax=lmax)


def get_N0(beam_fwhm=1.4, nlev_t=5., nlev_p=None, lmax_CMB=3000, lmin_CMB=100,
           lmax_out=None, cls_filt=None, cls_len=None, cls_weight=None, cls_sky=None,
           joint_TP=True, ksource='p', wfleg_Tcut=None):
    """Normalised N0 curves (gradient and curl) for [ksource+'tt', ksource+'_p'] and, with
    joint_TP, the GMV ksource key. Returns (N0s, N0_curls) dicts keyed by QE key."""
    if nlev_p is None:
        nlev_p = nlev_t * np.sqrt(2.)
    lmaxs = lmax_CMB if isinstance(lmax_CMB, dict) else {s: lmax_CMB for s in 'teb'}
    lmins = lmin_CMB if isinstance(lmin_CMB, dict) else {s: max(lmin_CMB, 1) for s in 'teb'}
    nlev_p = np.atleast_1d(np.asarray(nlev_p, dtype=float))
    if nlev_p.ndim == 2 and nlev_p.shape[0] == 2:
        nlev_e, nlev_b = nlev_p[0], nlev_p[1]
    else:
        nlev_e = nlev_b = nlev_p.squeeze()

    lmax_ivf = max(lmaxs.values())
    lmax_qlm = lmax_out or lmax_ivf
    cls_len = cls_len or _default_cls()
    cls_weight = cls_weight or _default_cls()
    cls_sky = cls_sky or _default_cls()
    cls_filt = cls_filt or _default_cls()

    transf = gauss_beam(beam_fwhm, lmax_ivf)
    NT = (np.asarray(nlev_t) / 60. / 180. * np.pi) ** 2 / transf ** 2
    NE = (np.asarray(nlev_e) / 60. / 180. * np.pi) ** 2 / transf ** 2
    NB = (np.asarray(nlev_b) / 60. / 180. * np.pi) ** 2 / transf ** 2

    cls_dat, cls_filter = {}, {}
    for cls, source in ((cls_dat, cls_sky), (cls_filter, cls_filt)):
        cls.update({'tt': source['tt'][:lmax_ivf + 1] + NT,
                    'ee': source['ee'][:lmax_ivf + 1] + NE,
                    'bb': source['bb'][:lmax_ivf + 1] + NB,
                    'te': np.copy(source['te'][:lmax_ivf + 1])})
        for s in cls.keys():
            cls[s][min(lmaxs[s[0]], lmaxs[s[1]]) + 1:] *= 0.
            cls[s][:max(lmins[s[0]], lmins[s[1]])] *= 0.

    fal_sepTP = {spec: cli(cls_filter[spec]) for spec in ['tt', 'ee', 'bb']}
    cls_ivfs_sepTP = cls_dot([fal_sepTP, cls_dat, fal_sepTP], ret_dict=True)
    fal_jtTP = cl_inverse(cls_filter)
    cls_ivfs_jtTP = cls_dot([fal_jtTP, cls_dat, fal_jtTP], ret_dict=True)

    if wfleg_Tcut is not None and wfleg_Tcut < lmaxs['t']:
        from copy import deepcopy
        fal_sepTP_b = deepcopy(fal_sepTP)
        fal_sepTP_b['tt'][wfleg_Tcut + 1:] *= 0
        cls_temp = deepcopy(cls_dat)
        for k in cls_temp:
            if 't' in k:
                cls_temp[k][wfleg_Tcut + 1:] *= 0
        fal_jtTP_b = cl_inverse(cls_temp)
        ab_sep = cls_dot([fal_sepTP, cls_dat, fal_sepTP_b], ret_dict=True)
        ba_sep = cls_dot([fal_sepTP_b, cls_dat, fal_sepTP], ret_dict=True)
        bb_sep = cls_dot([fal_sepTP_b, cls_dat, fal_sepTP_b], ret_dict=True)
        ab_jt = cls_dot([fal_jtTP, cls_dat, fal_jtTP_b], ret_dict=True)
        ba_jt = cls_dot([fal_jtTP_b, cls_dat, fal_jtTP], ret_dict=True)
        bb_jt = cls_dot([fal_jtTP_b, cls_dat, fal_jtTP_b], ret_dict=True)
    else:
        fal_sepTP_b, fal_jtTP_b = fal_sepTP, fal_jtTP
        ab_sep = ba_sep = bb_sep = cls_ivfs_sepTP
        ab_jt = ba_jt = bb_jt = cls_ivfs_jtTP

    for cls in [fal_sepTP, fal_jtTP, fal_sepTP_b, fal_jtTP_b, cls_ivfs_sepTP,
                cls_ivfs_jtTP, ab_sep, ba_sep, bb_sep, ab_jt, ba_jt, bb_jt]:
        for k in cls.keys():
            cls[k][:max(1, lmins[k[0]], lmins[k[1]])] *= 0.

    N0s, N0_curls = {}, {}
    for qe_key in [ksource + 'tt', ksource + '_p']:
        NG, NC, _, _ = nhl.get_nhl(qe_key, qe_key, cls_weight, cls_ivfs_sepTP, lmax_ivf,
                                   lmax_ivf, lmax_out=lmax_qlm, cls_ivfs_ab=ab_sep,
                                   cls_ivfs_ba=ba_sep, cls_ivfs_bb=bb_sep)
        RG, RC, _, _ = qresp.get_response(qe_key, lmax_ivf, ksource, cls_weight, cls_len,
                                          fal_sepTP, lmax_qlm=lmax_qlm, fal_leg2=fal_sepTP_b)
        N0s[qe_key] = cli(RG ** 2) * NG
        N0_curls[qe_key] = cli(RC ** 2) * NC

    if joint_TP:
        NG, NC, _, _ = nhl.get_nhl(ksource, ksource, cls_weight, cls_ivfs_jtTP, lmax_ivf,
                                   lmax_ivf, lmax_out=lmax_qlm, cls_ivfs_ab=ab_jt,
                                   cls_ivfs_ba=ba_jt, cls_ivfs_bb=bb_jt)
        RG, RC, _, _ = qresp.get_response(ksource, lmax_ivf, ksource, cls_weight, cls_len,
                                          fal_jtTP, lmax_qlm=lmax_qlm, fal_leg2=fal_jtTP_b)
        N0s[ksource] = cli(RG ** 2) * NG
        N0_curls[ksource] = cli(RC ** 2) * NC
    else:
        NG, NC, _, _ = nhl.get_nhl(ksource, ksource, cls_weight, cls_ivfs_sepTP, lmax_ivf,
                                   lmax_ivf, lmax_out=lmax_qlm, cls_ivfs_ab=ab_sep,
                                   cls_ivfs_ba=ba_sep, cls_ivfs_bb=bb_sep)
        RG, RC, _, _ = qresp.get_response(ksource, lmax_ivf, ksource, cls_weight, cls_len,
                                          fal_sepTP, lmax_qlm=lmax_qlm, fal_leg2=fal_sepTP_b)
        N0s[ksource] = cli(RG ** 2) * NG
        N0_curls[ksource] = cli(RC ** 2) * NC
    return N0s, N0_curls
