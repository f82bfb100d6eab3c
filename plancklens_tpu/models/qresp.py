r"""Analytic QE responses.

QE keys (same grammar as the reference, cf. plancklens/qresp.py:1-31):
  sources: 'p' lensing gradient, 'x' lensing curl, 's' point sources, 'f' modulation,
  'a' polarisation rotation; maps: 'tt' (T only), '_p' (pol only), '' (MV/GMV), explicit
  pairs 'te', '_eb', ...; bias-hardening via '_bh_' infix ('ptt_bh_s').

The response of QE key k to source S is assembled from double spin sums of Wigner-space
convolutions (`wignerc`) of the QE weights, the filtering matrix and the covariance response
(reference: plancklens/qresp.py:269-312, 376-418). Here each `wignerc` is a pair of batched
matmuls against cached Wigner-d matrices on the GL grid (see plancklens_tpu.ops.wigner).
"""
import numpy as np

from ..utils.cls import joincls, cli, clinv
from ..ops.wigner import wignerc
from . import spin as uspin
from .qe import qeleg, qe, qe_simplify, qe_proj


def get_qes(qe_key, lmax, cls_weight, lmax2=None, transf=None):
    """Symbolic QE weights for a QE key, acting on inverse-variance filtered spin fields
    (reference behaviour: plancklens/qresp.py:50-101)."""
    if lmax2 is None:
        lmax2 = lmax
    if qe_key[0] in ['p', 'x', 'a', 'f', 's']:
        if qe_key in ['ptt', 'xtt', 'att', 'ftt', 'stt']:
            s_lefts = [0]
        elif qe_key in ['p_p', 'x_p', 'a_p', 'f_p']:
            s_lefts = [-2, 2]
        else:
            s_lefts = [0, -2, 2]
        qes = []
        s_rights_in = s_lefts
        for s_left in s_lefts:
            for sin in s_rights_in:
                sout = -s_left
                s_qe, irr1, cl_sosi, cL_out = get_covresp(qe_key[0], sout, sin, cls_weight,
                                                          lmax2, transf=transf)
                if np.any(cl_sosi):
                    lega = qeleg(s_left, s_left,
                                 0.5 * (1. + (s_left == 0)) * np.ones(lmax + 1, dtype=float))
                    legb = qeleg(sin, sout + s_qe, 0.5 * (1. + (sin == 0)) * 2 * cl_sosi)
                    qes.append(qe(lega, legb, cL_out))
        if len(qe_key) == 1 or qe_key[1:] in ['tt', '_p']:
            return qe_simplify(qes)
        elif qe_key[1:] in ['te', 'et', 'tb', 'bt', 'ee', 'eb', 'be', 'bb']:
            return qe_simplify(qe_proj(qes, qe_key[1], qe_key[2]))
        elif qe_key[1:] in ['_te', '_tb', '_eb']:
            return qe_simplify(qe_proj(qes, qe_key[2], qe_key[3])
                               + qe_proj(qes, qe_key[3], qe_key[2]))
        else:
            assert 0, 'qe key %s not recognized' % qe_key
    elif qe_key in ['ntt']:
        # noise-variance estimator: inverse-beam weights on both legs
        # (reference: plancklens/qresp.py:88-92)
        assert transf is not None
        lega = qeleg(0, 0, clinv(np.asarray(transf)[:lmax + 1]))
        legb = qeleg(0, 0, 0.5 * clinv(np.asarray(transf)[:lmax + 1]))
        return qe_simplify([qe(lega, legb, lambda L: np.ones(len(L), dtype=float))])
    elif qe_key in ['ktt']:
        # 'kappa-tt' BFK-type estimator (reference: plancklens/qresp.py:93-99)
        ls = np.arange(1, lmax + 3)
        dlnDldlnl = ls[:-1] * np.diff(np.log(cls_weight['tt'][ls] * ls * (ls + 1)))
        lega = qeleg(0, 0, np.ones(lmax + 1, dtype=float))
        legb = qeleg(0, 0, 0.5 * cls_weight['tt'][:lmax + 1] * dlnDldlnl)
        return qe_simplify([qe(lega, legb, lambda L: -L * (L + 1.))])
    assert 0, qe_key + ' not implemented'


def get_resp_legs(source, lmax):
    r"""Per-spin harmonic response of a CMB map to an anisotropy source: 4-tuple
    (source spin r, response for +r, response for -r, G/C -> potential scaling)
    (reference: plancklens/qresp.py:104-133)."""
    lmax_ = lmax
    if source in ['p', 'x']:
        return {s: (1, -0.5 * uspin.get_spin_lower(s, lmax_),
                    -0.5 * uspin.get_spin_raise(s, lmax_),
                    lambda ell: uspin.get_spin_raise(0, np.max(ell))[ell])
                for s in [0, -2, 2]}
    if source == 'f':
        return {s: (0, 0.5 * np.ones(lmax_ + 1), 0.5 * np.ones(lmax_ + 1),
                    lambda ell: np.ones(len(ell), dtype=float)) for s in [0, -2, 2]}
    if source in ['a', 'a_p']:
        ret = {s: (0, -np.sign(s) * 1j * np.ones(lmax_ + 1),
                   -np.sign(s) * 1j * np.ones(lmax_ + 1),
                   lambda ell: np.ones(len(ell), dtype=float)) for s in [-2, 2]}
        ret[0] = (0, np.zeros(lmax_ + 1), np.zeros(lmax_ + 1),
                  lambda ell: np.ones(len(ell), dtype=float))
        return ret
    assert 0, source + ' response legs not implemented'


def get_covresp(source, s1, s2, cls, lmax, transf=None):
    r"""Response of the spin-(s1, s2) CMB covariance to the anisotropy source
    (reference: plancklens/qresp.py:135-163)."""
    if source in ['p', 'x', 'f', 'a', 'a_p']:
        s_source, prR, mrR, cL_scal = get_resp_legs(source, lmax)[s1]
        coupl = uspin.spin_cls(s1, s2, cls)[:lmax + 1]
        return s_source, prR * coupl, mrR * coupl, cL_scal
    elif source in ['stt', 's']:
        cond = s1 == 0 and s2 == 0
        unit = 0.25 * cond * np.ones(lmax + 1, dtype=float)
        return 0, unit, unit.copy(), lambda ell: np.ones(len(ell), dtype=float)
    assert 0, 'source ' + source + ' cov. response not implemented'


def qe_spin_data(qe_key):
    """(output spin, 'G'/'C', input spins, spin-1 source key) for a QE key
    (reference: plancklens/qresp.py:165-180)."""
    if qe_key in ['ntt']:
        return 0, 'G', [0], 'n'
    qes = get_qes(qe_key, 10, {k: np.ones(15, dtype=float) for k in ['tt', 'te', 'ee', 'bb']})
    spins_out = [q.leg_a.spin_ou + q.leg_b.spin_ou for q in qes]
    spins_in = np.unique(np.abs([q.leg_a.spin_in for q in qes]
                                + [q.leg_b.spin_in for q in qes]))
    assert len(np.unique(spins_out)) == 1, spins_out
    assert spins_out[0] >= 0, spins_out[0]
    if spins_out[0] > 0:
        assert qe_key[0] in ['x', 'p'], 'non-zero spin QE ' + qe_key + ' not implemented?'
    return spins_out[0], 'C' if qe_key[0] == 'x' else 'G', spins_in, \
        'p' if qe_key[0] == 'x' else qe_key[0]


def get_response(qe_key, lmax_ivf, source, cls_weight, cls_cmb, fal, fal_leg2=None,
                 lmax_ivf2=None, lmax_qlm=None, transf=None):
    r"""Isotropic QE response 4-tuple (R^GG, R^CC, R^GC, R^CG)
    (reference: plancklens/qresp.py:269-312).

    Args mirror the reference: `cls_weight` enters the QE weights, `cls_cmb` the CMB
    covariance response, `fal` the isotropic filtering spectra (1/(C+N/b^2)-style).
    """
    if lmax_ivf2 is None:
        lmax_ivf2 = lmax_ivf
    if lmax_qlm is None:
        lmax_qlm = lmax_ivf + lmax_ivf2
    if '_bh_' in qe_key:
        k, hsource = qe_key.split('_bh_')
        assert len(hsource) == 1, hsource
        h = hsource[0]
        kw = dict(fal_leg2=fal_leg2, lmax_ivf2=lmax_ivf2, lmax_qlm=lmax_qlm, transf=transf)
        R_ks = get_response(k, lmax_ivf, source, cls_weight, cls_cmb, fal, **kw)
        R_hs = get_response(h + k[1:], lmax_ivf, source, cls_weight, cls_cmb, fal, **kw)
        R_kh = get_response(k, lmax_ivf, h, cls_weight, cls_cmb, fal, **kw)
        R_hh = get_response(h + k[1:], lmax_ivf, h, cls_weight, cls_cmb, fal, **kw)
        GG_ks, CC_ks, GC_ks, CG_ks = R_ks
        GG_hs, CC_hs, GC_hs, CG_hs = R_hs
        GG_kh, CC_kh, GC_kh, CG_kh = R_kh
        GG_hh, CC_hh, GC_hh, CG_hh = R_hh
        RGG = GG_ks - (GG_kh * GG_hs * cli(GG_hh) + GC_kh * CG_hs * cli(CC_hh))
        RCC = CC_ks - (CG_kh * GC_hs * cli(GG_hh) + CC_kh * CC_hs * cli(CC_hh))
        RGC = GC_ks - (GG_kh * GC_hs * cli(GG_hh) + GC_kh * CC_hs * cli(CC_hh))
        RCG = CG_ks - (CG_kh * GG_hs * cli(GG_hh) + CC_kh * CG_hs * cli(CC_hh))
        return RGG, RCC, RGC, RCG

    qes = get_qes(qe_key, lmax_ivf, cls_weight, lmax2=lmax_ivf2, transf=transf)
    if 'tt' in qe_key and source in ['n', 'ntt']:
        return _get_response_ntt(qes, fal, lmax_qlm, fal_leg2=fal_leg2, transf=transf)
    return _get_response(qes, source, cls_cmb, fal, lmax_qlm, fal_leg2=fal_leg2)


def _get_response(qes, source, cls_cmb, fal_leg1, lmax_qlm, fal_leg2=None):
    """Double spin-sum assembly of the response (reference: plancklens/qresp.py:376-418)."""
    fal_leg2 = fal_leg1 if fal_leg2 is None else fal_leg2
    RGG = np.zeros(lmax_qlm + 1, dtype=float)
    RCC = np.zeros(lmax_qlm + 1, dtype=float)
    RGC = np.zeros(lmax_qlm + 1, dtype=float)
    RCG = np.zeros(lmax_qlm + 1, dtype=float)
    Ls = np.arange(lmax_qlm + 1, dtype=int)
    for q in qes:
        si, ti = (q.leg_a.spin_in, q.leg_b.spin_in)
        so, to = (q.leg_a.spin_ou, q.leg_b.spin_ou)
        for s2 in [0, -2, 2]:
            FA = uspin.get_spin_matrix(si, s2, fal_leg1)
            if not np.any(FA):
                continue
            for t2 in [0, -2, 2]:
                FB = uspin.get_spin_matrix(ti, t2, fal_leg2)
                if not np.any(FB):
                    continue
                rW_st, prW_st, mrW_st, s_cL_st = get_covresp(source, -s2, t2, cls_cmb,
                                                             len(FB) - 1)
                clA = joincls([q.leg_a.cl, FA])
                clB = joincls([q.leg_b.cl, FB, mrW_st.conj()])
                Rpr_st = wignerc(clA, clB, so, s2, to, -s2 + rW_st, lmax_out=lmax_qlm) \
                    * s_cL_st(Ls)

                rW_ts, prW_ts, mrW_ts, s_cL_ts = get_covresp(source, -t2, s2, cls_cmb,
                                                             len(FA) - 1)
                clA = joincls([q.leg_a.cl, FA, mrW_ts.conj()])
                clB = joincls([q.leg_b.cl, FB])
                Rpr_st = Rpr_st + wignerc(clA, clB, so, -t2 + rW_ts, to, t2,
                                          lmax_out=lmax_qlm) * s_cL_ts(Ls)
                assert rW_st == rW_ts and rW_st >= 0, (rW_st, rW_ts)
                if rW_st > 0:
                    clA = joincls([q.leg_a.cl, FA])
                    clB = joincls([q.leg_b.cl, FB, prW_st.conj()])
                    Rmr_st = wignerc(clA, clB, so, s2, to, -s2 - rW_st,
                                     lmax_out=lmax_qlm) * s_cL_st(Ls)
                    clA = joincls([q.leg_a.cl, FA, prW_ts.conj()])
                    clB = joincls([q.leg_b.cl, FB])
                    Rmr_st = Rmr_st + wignerc(clA, clB, so, -t2 - rW_ts, to, t2,
                                              lmax_out=lmax_qlm) * s_cL_ts(Ls)
                else:
                    Rmr_st = Rpr_st
                prefac = q.cL(Ls)
                RGG += prefac * (Rpr_st.real + Rmr_st.real * (-1) ** rW_st)
                RCC += prefac * (Rpr_st.real - Rmr_st.real * (-1) ** rW_st)
                RGC += prefac * (-Rpr_st.imag + Rmr_st.imag * (-1) ** rW_st)
                RCG += prefac * (Rpr_st.imag + Rmr_st.imag * (-1) ** rW_st)
    return RGG, RCC, RGC, RCG


def _get_response_ntt(qes, fal_leg1, lmax_qlm, fal_leg2=None, transf=None):
    """Response of TT-like QEs to the noise-variance source 'ntt'
    (reference: plancklens/qresp.py:315-361)."""
    assert transf is not None
    fal_leg2 = fal_leg1 if fal_leg2 is None else fal_leg2
    RGG = np.zeros(lmax_qlm + 1, dtype=float)
    RCC = np.zeros(lmax_qlm + 1, dtype=float)
    RGC = np.zeros(lmax_qlm + 1, dtype=float)
    RCG = np.zeros(lmax_qlm + 1, dtype=float)
    Ls = np.arange(lmax_qlm + 1, dtype=int)
    transfi = clinv(np.asarray(transf, dtype=float))
    for q in qes:
        si, ti = (q.leg_a.spin_in, q.leg_b.spin_in)
        so, to = (q.leg_a.spin_ou, q.leg_b.spin_ou)
        assert (si, ti) == (0, 0)
        s_qe = abs(so + to)
        FA = uspin.get_spin_matrix(si, 0, fal_leg1)
        FB = uspin.get_spin_matrix(ti, 0, fal_leg2)
        if not (np.any(FA) and np.any(FB)):
            continue
        clA = joincls([q.leg_a.cl, FA, transfi])
        clB = joincls([q.leg_b.cl, FB, transfi])
        Rpr_st = wignerc(clA, clB, so, 0, to, 0, lmax_out=lmax_qlm)
        if s_qe > 0:
            fac = (-1) ** (so + si + to + ti)
            FA = uspin.get_spin_matrix(-si, 0, fal_leg1)
            FB = uspin.get_spin_matrix(-ti, 0, fal_leg2)
            clA = joincls([np.conj(q.leg_a.cl), FA, transfi])
            clB = joincls([np.conj(q.leg_b.cl), FB, transfi])
            Rmr_st = fac * wignerc(clA, clB, -so, 0, -to, 0, lmax_out=lmax_qlm)
        else:
            Rmr_st = Rpr_st
        prefac = 0.5 * q.cL(Ls)
        Rpr = np.atleast_1d(Rpr_st)
        Rmr = np.atleast_1d(Rmr_st)
        RGG += prefac * (Rpr.real + Rmr.real * (-1) ** s_qe)
        RCC += prefac * (Rpr.real - Rmr.real * (-1) ** s_qe)
        RGC += prefac * (-np.imag(Rpr) + np.imag(Rmr) * (-1) ** s_qe)
        RCG += prefac * (np.imag(Rpr) + np.imag(Rmr) * (-1) ** s_qe)
    return RGG, RCC, RGC, RCG


def get_dresponse_dlncl(qe_key, l, cl_key, lmax_ivf, source, cls_weight, cls_cmb, fal_leg1,
                        fal_leg2=None, lmax_ivf2=None, lmax_out=None):
    """dR_L / dln C_l (reference: plancklens/qresp.py:364-374)."""
    if lmax_ivf2 is None:
        lmax_ivf2 = lmax_ivf
    if lmax_out is None:
        lmax_out = lmax_ivf2 + lmax_ivf
    dcls_cmb = {k: np.zeros_like(cls_cmb[k]) for k in cls_cmb.keys()}
    dcls_cmb[cl_key][l] = cls_cmb[cl_key][l]
    qes = get_qes(qe_key, lmax_ivf, cls_weight, lmax2=lmax_ivf2)
    return _get_response(qes, source, dcls_cmb, fal_leg1, lmax_out, fal_leg2=fal_leg2)


class RespLib:
    """Cached QE response library (reference: plancklens/qresp.py:183-266).

    get_response(k, ksource) returns the G (or C for curl keys) response array.
    """

    def __init__(self, lmax_ivf, cls_weight, cls_cmb, fal, lmax_qlm, transf=None,
                 cacher=None):
        from ..utils.cachers import cacher_mem
        self.lmax_qe = lmax_ivf
        self.lmax_qlm = lmax_qlm
        self.cls_weight = cls_weight
        self.cls_cmb = cls_cmb
        self.fal = fal
        self.transf = transf
        self.cacher = cacher if cacher is not None else cacher_mem()

    def hashdict(self):
        from ..utils.hashing import clhash
        ret = {'lmaxqe': self.lmax_qe, 'lmax_qlm': self.lmax_qlm}
        for k in self.cls_weight.keys():
            ret['clsweight ' + k] = clhash(self.cls_weight[k])
        for k in self.cls_cmb.keys():
            ret['clscmb ' + k] = clhash(self.cls_cmb[k])
        for k in self.fal.keys():
            ret['fal' + k] = clhash(self.fal[k])
        return ret

    def get_response(self, k, ksource):
        if '_bh_' in k:  # bias-hardened estimator (reference: qresp.py:238-245)
            kQE, bhksource = k.split('_bh_')
            assert len(bhksource) == 1, (kQE, ksource)
            wL = self.get_response(kQE, bhksource)
            wL = wL * cli(self.get_response(bhksource + kQE[1:], bhksource))
            ret = self.get_response(kQE, ksource)
            return ret - wL * self.get_response(bhksource + kQE[1:], ksource)
        if k in ['xmtt', 'pmtt']:
            return self.get_response(k[0], ksource) - self.get_response(k[0] + 'tt', ksource)
        s, GorC, sins, ksp = qe_spin_data(k)
        fn = 'qe_' + ksp + k[1:] + '_source_%s_' % ksource + GorC + GorC
        if not self.cacher.is_cached(fn):
            GG, CC, GC, CG = get_response(k, self.lmax_qe, ksource, self.cls_weight,
                                          self.cls_cmb, self.fal, lmax_qlm=self.lmax_qlm,
                                          transf=self.transf)
            self.cacher.cache('qe_' + ksp + k[1:] + '_source_%s_' % ksource + 'GG', GG)
            if s > 0:
                self.cacher.cache('qe_' + ksp + k[1:] + '_source_%s_' % ksource + 'CC', CC)
        return np.asarray(self.cacher.load(fn))


def get_mf_resp(qe_key, cls_cmb, cls_ivfs, lmax_qe, lmax_out, retterms=False):
    """Deflection-induced mean-field response (Carron & Lewis 2019)
    (reference: plancklens/qresp.py:421-501)."""
    assert qe_key in ['p_p', 'ptt'], qe_key
    GL = np.zeros(lmax_out + 1, dtype=float)
    CL = np.zeros(lmax_out + 1, dtype=float)
    if qe_key == 'ptt':
        lmax_cmb = len(cls_cmb['tt']) - 1
        spins = [0]
    elif qe_key == 'p_p':
        lmax_cmb = min(len(cls_cmb['ee']) - 1, len(cls_cmb['bb']) - 1)
        spins = [-2, 2]
    else:
        assert 0
    assert lmax_qe <= lmax_cmb
    if qe_key == 'ptt':
        cl_cmbtoticmb = {'tt': cls_cmb['tt'][:lmax_qe + 1] ** 2 * cls_ivfs['tt'][:lmax_qe + 1]}
        cl_cmbtoti = {'tt': cls_cmb['tt'][:lmax_qe + 1] * cls_ivfs['tt'][:lmax_qe + 1]}
    else:
        cl_cmbtoticmb = {'ee': cls_cmb['ee'][:lmax_qe + 1] ** 2 * cls_ivfs['ee'][:lmax_qe + 1],
                         'bb': cls_cmb['bb'][:lmax_qe + 1] ** 2 * cls_ivfs['bb'][:lmax_qe + 1]}
        cl_cmbtoti = {'ee': cls_cmb['ee'][:lmax_qe + 1] * cls_ivfs['ee'][:lmax_qe + 1],
                      'bb': cls_cmb['bb'][:lmax_qe + 1] * cls_ivfs['bb'][:lmax_qe + 1]}
    FisherGII = np.zeros(lmax_out + 1, dtype=float)
    FisherCII = np.zeros(lmax_out + 1, dtype=float)
    terms = {'GK': np.zeros(lmax_out + 1), 'GxiK': np.zeros(lmax_out + 1)}
    for s1 in spins:  # (xi K xi - xi)(K)-type terms
        for s2 in spins:
            cl1 = uspin.spin_cls(s1, s2, cls_ivfs)[:lmax_qe + 1] \
                * (0.5 ** (s1 != 0) * 0.5 ** (s2 != 0))
            cl2 = np.copy(uspin.spin_cls(s2, s1, cls_cmb)[:lmax_cmb + 1])
            cl2[:lmax_qe + 1] -= uspin.spin_cls(s2, s1, cl_cmbtoticmb)[:lmax_qe + 1]
            if np.any(cl1) and np.any(cl2):
                for a in [-1, 1]:
                    ai = uspin.get_spin_lower(s2, lmax_cmb) if a == -1 \
                        else uspin.get_spin_raise(s2, lmax_cmb)
                    for b in [1]:  # (a, b) symmetry
                        aj = uspin.get_spin_lower(-s1, lmax_cmb) if b == 1 \
                            else uspin.get_spin_raise(-s1, lmax_cmb)
                        hL = 2 * (-1) ** (s1 + s2) * wignerc(
                            cl1, cl2 * ai * aj, s2, s1, -s2 - a, -s1 - b, lmax_out=lmax_out)
                        GL += (-a * b) * hL
                        CL += (-1) * hL
    for s1 in spins:  # (xi K)(xi K)-type terms
        for s2 in spins:
            cl1 = uspin.spin_cls(s2, s1, cl_cmbtoti)[:lmax_qe + 1] * (0.5 ** (s1 != 0))
            cl2 = uspin.spin_cls(s1, s2, cl_cmbtoti)[:lmax_qe + 1] * (0.5 ** (s2 != 0))
            if np.any(cl1) and np.any(cl2):
                for a in [-1, 1]:
                    ai = uspin.get_spin_lower(s2, lmax_qe) if a == -1 \
                        else uspin.get_spin_raise(s2, lmax_qe)
                    for b in [1]:
                        aj = uspin.get_spin_lower(s1, lmax_qe) if b == 1 \
                            else uspin.get_spin_raise(s1, lmax_qe)
                        hL = 2 * (-1) ** (s1 + s2) * wignerc(
                            cl1 * ai, cl2 * aj, -s2 - a, -s1, s2, s1 - b, lmax_out=lmax_out)
                        FisherGII += (-a * b) * hL
                        FisherCII += (-1) * hL
    terms['GK'] += GL
    terms['GxiK'] -= FisherGII
    GL -= FisherGII
    CL -= FisherCII
    terms['Gcons'] = -np.ones_like(GL) * CL[1]
    GL -= CL[1]
    CL -= CL[1]
    fac = 0.25 * np.arange(lmax_out + 1) * np.arange(1, lmax_out + 2)
    GL *= fac
    CL *= fac
    for term in terms.values():
        term *= fac
    return (GL, CL) if not retterms else (GL, CL, terms)
