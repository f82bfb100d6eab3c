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


def cls2dls(cls):
    """cls dict -> (N, 4) D_l array + D-scaled clpp (reference: plancklens/nhl.py:191-205)."""
    keys = ['tt', 'ee', 'bb', 'te']
    lmax = np.max([len(cl) for cl in cls.values()]) - 1
    dls = np.zeros((lmax + 1, 4), dtype=float)
    refac = np.arange(lmax + 1) * np.arange(1, lmax + 2, dtype=float) / (2. * np.pi)
    for i, k in enumerate(keys):
        cl = cls.get(k, np.zeros(lmax + 1, dtype=float))
        sli = slice(0, min(len(cl), lmax + 1))
        dls[sli, i] = cl[sli] * refac[sli]
    cldd = np.copy(cls.get('pp', None))
    if cldd is not None:
        cldd *= np.arange(len(cldd)) ** 2 * np.arange(1, len(cldd) + 1, dtype=float) ** 2 \
            / (2. * np.pi)
    return dls, cldd


def dls2cls(dls):
    """Inverse of cls2dls (reference: plancklens/nhl.py:207-214)."""
    assert dls.shape[1] == 4
    lmax = dls.shape[0] - 1
    cls = {}
    refac = 2. * np.pi * cli(np.arange(lmax + 1) * np.arange(1, lmax + 2, dtype=float))
    for i, k in enumerate(['tt', 'ee', 'bb', 'te']):
        cls[k] = dls[:, i] * refac
    return cls


def get_N0_iter(qe_key, nlev_t, nlev_p, beam_fwhm, cls_unl_fid, lmin_ivf, lmax_ivf,
                itermax, cls_unl_dat=None, lmax_qlm=None, ret_delcls=False,
                datnoise_cls=None, unlQE=False, rho_sqd_ext=0., filter_E=False,
                ret_curl=False):
    """Iterative (MAP-estimator forecast) lensing N0 (reference: plancklens/n0s.py:236-448).

    Iteratively computes partially-delensed spectra and the corresponding N0; the partially
    lensed spectra come from the built-in correlation-function lensed_cls operator
    (ops/lensed_cls) instead of the camb dependency of the reference.

    Args beyond the obvious:
        lmin_ivf / lmax_ivf: scalars, or dicts keyed by 't','e','b' for per-field cuts
        cls_unl_dat: true sky spectra when different from the fiducial
        datnoise_cls: custom data noise spectra (the nlevs then only enter the filter)
        unlQE: weight/filter with unlensed instead of (partially) lensed spectra
        rho_sqd_ext: squared cross-correlation of an external tracer used for additional
            delensing (scalar or array over L); rho -> 1 means the tracer removes all
            lensing not already removed internally
        filter_E: linear delensing — subtract the B-template built from Wiener-filtered
            *lensed* E (imperfect knowledge of E), instead of assuming E known perfectly
        ret_curl: also return the curl-mode N0s

    Returns (N0s_biased, N0s_unbiased[, N0s_unbiased_curl, N0s_biased_curl]
    [, delcls_fid, delcls_true]); N0 arrays have shape (itermax+1, lmax_qlm+1).
    """
    from ..ops.lensed_cls import lensed_cls as _lensed_cls
    from . import nhl as nhl_mod
    assert qe_key in ['p_p', 'p', 'ptt'], qe_key
    lmaxs = lmax_ivf if isinstance(lmax_ivf, dict) else {s: lmax_ivf for s in 'teb'}
    lmins = lmin_ivf if isinstance(lmin_ivf, dict) else \
        {s: max(lmin_ivf, 1) for s in 'teb'}
    lmax_ivf = max(lmaxs.values())

    def _d2p(cldd):
        """D-convention deflection spectrum -> C_L^pp."""
        lp = np.arange(len(cldd), dtype=float)
        return cldd * cli(lp ** 2 * (lp + 1.) ** 2 / (2. * np.pi))

    def _lencls(cls_unl_dict, cldd, delta=False):
        return _lensed_cls(cls_unl_dict, _d2p(cldd), delta_cls=delta,
                           lmax_out=min(len(cls_unl_dict['tt']) - 1, lmax_ivf + 500))

    _, cldd_fid0 = cls2dls(cls_unl_fid)
    if lmax_qlm is None:
        lmax_qlm = 2 * lmax_ivf
    # the iteration needs the deflection spectrum up to lmax_qlm
    lmax_qlm = min(lmax_qlm, 2 * lmax_ivf, len(cldd_fid0) - 1)
    transfi2 = cli(gauss_beam(beam_fwhm, lmax_ivf)) ** 2
    llp2 = np.arange(lmax_qlm + 1, dtype=float) ** 2 \
        * np.arange(1, lmax_qlm + 2, dtype=float) ** 2 / (2. * np.pi)
    nlev_p = np.atleast_1d(np.asarray(nlev_p, dtype=float))
    if nlev_p.ndim == 2 and nlev_p.shape[0] == 2:
        nlev_e, nlev_b = nlev_p[0], nlev_p[1]
    else:
        nlev_e = nlev_b = nlev_p.squeeze()
    if not np.isscalar(rho_sqd_ext):
        rho_sqd_ext = np.asarray(rho_sqd_ext)[:lmax_qlm + 1]
    if datnoise_cls is None:
        datnoise_cls = dict()
        if qe_key in ['ptt', 'p']:
            datnoise_cls['tt'] = (nlev_t * np.pi / 180. / 60.) ** 2 * transfi2
        if qe_key in ['p_p', 'p']:
            datnoise_cls['ee'] = (nlev_e * np.pi / 180. / 60.) ** 2 * transfi2
            datnoise_cls['bb'] = (nlev_b * np.pi / 180. / 60.) ** 2 * transfi2
    N0s_biased, N0s_unbiased = [], []
    N0s_biased_cc, N0s_unbiased_cc = [], []
    delcls_fid, delcls_true = [], []
    N0_unbiased = np.inf

    cls_len_fid = _lencls(cls_unl_fid, cldd_fid0)
    if cls_unl_dat is None:
        cls_unl_dat = cls_unl_fid
        cls_len_true = cls_len_fid
    else:
        _, cldd_true0 = cls2dls(cls_unl_dat)
        cls_len_true = _lencls(cls_unl_dat, cldd_true0)
    cls_plen_true = cls_len_true

    for it in range(itermax + 1):
        _, cldd_true = cls2dls(cls_unl_dat)
        _, cldd_fid = cls2dls(cls_unl_fid)
        if it == 0:
            rho_sqd_phi = rho_sqd_ext
        else:
            # resolved lensing fraction; the external tracer keeps delensing the part the
            # internal estimate misses (reference: plancklens/n0s.py:357-362)
            rho_sqd_phi = np.zeros(len(cldd_true))
            N0_now = llp2 * N0_unbiased[:lmax_qlm + 1]
            rho_sqd_phi[:lmax_qlm + 1] = \
                ((1. - rho_sqd_ext) * cldd_true[:lmax_qlm + 1] + rho_sqd_ext * N0_now) \
                * cli((1. - rho_sqd_ext) * cldd_true[:lmax_qlm + 1] + N0_now)

        if filter_E:
            # linear delensing with the B-template from Wiener-filtered lensed E: only the
            # rho_E-weighted part of E contributes to the removable lensing B power
            assert qe_key in ['p_p'], 'filter_E is a polarisation-delensing option'
            sl = slice(lmins['e'], lmaxs['e'] + 1)
            rho_sqd_E = np.zeros(len(cls_unl_dat['ee']))
            rho_sqd_E[sl] = cls_unl_dat['ee'][sl] \
                * cli(cls_plen_true['ee'][sl] + datnoise_cls['ee'][sl])
            unl_fid_wf = dict(cls_unl_fid)
            unl_fid_wf['ee'] = cls_unl_fid['ee'] * rho_sqd_E[:len(cls_unl_fid['ee'])]
            unl_true_wf = dict(cls_unl_dat)
            unl_true_wf['ee'] = cls_unl_dat['ee'] * rho_sqd_E[:len(cls_unl_dat['ee'])]
            dfid = _lencls(unl_fid_wf, cldd_fid * rho_sqd_phi, delta=True)
            dtrue = _lencls(unl_true_wf, cldd_true * rho_sqd_phi, delta=True)
            cldd_fid = cldd_fid * (1. - rho_sqd_phi)
            cldd_true = cldd_true * (1. - rho_sqd_phi)
            cls_plen_fid = {k: cls_len_fid[k] - dfid[k] for k in dfid}
            cls_plen_true = {k: cls_len_true[k] - dtrue[k] for k in dtrue}
        else:
            cldd_true = cldd_true * (1. - rho_sqd_phi)
            cldd_fid = cldd_fid * (1. - rho_sqd_phi)
            cls_plen_fid = _lencls(cls_unl_fid, cldd_fid)
            cls_plen_true = _lencls(cls_unl_dat, cldd_true) \
                if cls_unl_dat is not cls_unl_fid \
                else {k: np.copy(v) for k, v in cls_plen_fid.items()}

        cls_filt = cls_plen_fid if not unlQE else cls_unl_fid
        cls_w = cls_plen_fid if not unlQE else cls_unl_fid
        cls_f = cls_plen_true
        fal, dat_delcls = {}, {}
        if qe_key in ['ptt', 'p']:
            fal['tt'] = cls_filt['tt'][:lmax_ivf + 1] \
                + (nlev_t * np.pi / 180. / 60.) ** 2 * transfi2
            dat_delcls['tt'] = cls_plen_true['tt'][:lmax_ivf + 1] + datnoise_cls['tt']
        if qe_key in ['p_p', 'p']:
            fal['ee'] = cls_filt['ee'][:lmax_ivf + 1] \
                + (nlev_e * np.pi / 180. / 60.) ** 2 * transfi2
            fal['bb'] = cls_filt['bb'][:lmax_ivf + 1] \
                + (nlev_b * np.pi / 180. / 60.) ** 2 * transfi2
            dat_delcls['ee'] = cls_plen_true['ee'][:lmax_ivf + 1] + datnoise_cls['ee']
            dat_delcls['bb'] = cls_plen_true['bb'][:lmax_ivf + 1] + datnoise_cls['bb']
        if qe_key in ['p']:
            fal['te'] = np.copy(cls_filt['te'][:lmax_ivf + 1])
            dat_delcls['te'] = np.copy(cls_plen_true['te'][:lmax_ivf + 1])
        for spec in fal:
            fal[spec][min(lmaxs[spec[0]], lmaxs[spec[1]]) + 1:] *= 0.
        for spec in dat_delcls:
            dat_delcls[spec][min(lmaxs[spec[0]], lmaxs[spec[1]]) + 1:] *= 0.
        fal = cl_inverse(fal)
        for spec, cl in fal.items():
            cl[:max(lmins[spec[0]], lmins[spec[1]])] *= 0.
        for spec, cl in dat_delcls.items():
            cl[:max(lmins[spec[0]], lmins[spec[1]])] *= 0.
        cls_ivfs_arr = cls_dot([fal, dat_delcls, fal])
        cls_ivfs = dict()
        for i, a in enumerate(['t', 'e', 'b']):
            for j, b in enumerate(['t', 'e', 'b'][i:]):
                if np.any(cls_ivfs_arr[i, j + i]):
                    cls_ivfs[a + b] = cls_ivfs_arr[i, j + i]

        n_gg, n_cc = nhl_mod.get_nhl(qe_key, qe_key, cls_w, cls_ivfs, lmax_ivf, lmax_ivf,
                                     lmax_out=lmax_qlm)[:2]
        r_gg_true, r_cc_true = qresp.get_response(qe_key, lmax_ivf, 'p', cls_w, cls_f, fal,
                                                  lmax_qlm=lmax_qlm)[:2]
        r_gg_fid, r_cc_fid = (r_gg_true, r_cc_true) if cls_f is cls_w else \
            qresp.get_response(qe_key, lmax_ivf, 'p', cls_w, cls_w, fal,
                               lmax_qlm=lmax_qlm)[:2]
        N0_biased = n_gg * cli(r_gg_fid ** 2)
        N0_unbiased = n_gg * cli(r_gg_true ** 2)
        N0s_biased.append(N0_biased)
        N0s_unbiased.append(N0_unbiased)
        N0s_biased_cc.append(n_cc * cli(r_cc_fid ** 2))
        N0s_unbiased_cc.append(n_cc * cli(r_cc_true ** 2))
        cls_plen_true['pp'] = _d2p(cldd_true)
        cls_plen_fid['pp'] = _d2p(cldd_fid)
        delcls_fid.append(cls_plen_fid)
        delcls_true.append(cls_plen_true)

    ret = (np.array(N0s_biased), np.array(N0s_unbiased))
    if ret_curl:
        ret = ret + (np.array(N0s_unbiased_cc), np.array(N0s_biased_cc))
    if ret_delcls:
        ret = ret + (delcls_fid, delcls_true)
    return ret
