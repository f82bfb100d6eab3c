r"""Semi-analytic Gaussian noise biases (unnormalised N0).

N0 for the cross-spectrum of two QEs from Wigner-space contractions of the QE weights with
the inverse-variance-filtered CMB spectra (reference: plancklens/nhl.py:15-97). Each
contraction is a batched matmul against cached Wigner-d matrices.
"""
import numpy as np

from ..utils.cls import joincls
from ..ops.wigner import wignerc
from . import spin as uspin
from . import qresp


def get_nhl(qe_key1, qe_key2, cls_weights, cls_ivfs, lmax_ivf1, lmax_ivf2,
            lmax_out=None, lmax_ivf12=None, lmax_ivf22=None, cls_weights2=None,
            cls_ivfs_bb=None, cls_ivfs_ab=None, cls_ivfs_ba=None):
    """4-tuple (GG, CC, GC, CG) of Gaussian noise covariances for two QE keys
    (reference: plancklens/nhl.py:15-43)."""
    if lmax_ivf12 is None:
        lmax_ivf12 = lmax_ivf1
    if lmax_ivf22 is None:
        lmax_ivf22 = lmax_ivf2
    if cls_weights2 is None:
        cls_weights2 = cls_weights
    qes1 = qresp.get_qes(qe_key1, lmax_ivf1, cls_weights, lmax2=lmax_ivf12)
    qes2 = qresp.get_qes(qe_key2, lmax_ivf2, cls_weights2, lmax2=lmax_ivf22)
    if lmax_out is None:
        lmax_out = max(lmax_ivf1, lmax_ivf12) + max(lmax_ivf2, lmax_ivf22)
    return _get_nhl(qes1, qes2, cls_ivfs, lmax_out, cls_ivfs_bb=cls_ivfs_bb,
                    cls_ivfs_ab=cls_ivfs_ab, cls_ivfs_ba=cls_ivfs_ba)


def _get_nhl(qes1, qes2, cls_ivfs, lmax_out, cls_ivfs_bb=None, cls_ivfs_ab=None,
             cls_ivfs_ba=None, ret_terms=False):
    """Wick contractions of the QE 4-point function (reference: plancklens/nhl.py:45-97)."""
    GG = np.zeros(lmax_out + 1, dtype=float)
    CC = np.zeros(lmax_out + 1, dtype=float)
    GC = np.zeros(lmax_out + 1, dtype=float)
    CG = np.zeros(lmax_out + 1, dtype=float)
    cls_aa = cls_ivfs
    cls_bb = cls_ivfs if cls_ivfs_bb is None else cls_ivfs_bb
    cls_ab = cls_ivfs if cls_ivfs_ab is None else cls_ivfs_ab
    cls_ba = cls_ivfs if cls_ivfs_ba is None else cls_ivfs_ba
    terms = []
    Ls = np.arange(lmax_out + 1)
    for qe1 in qes1:
        cL1 = qe1.cL(Ls)
        for qe2 in qes2:
            cL2 = qe2.cL(Ls)
            si, ti, ui, vi = (qe1.leg_a.spin_in, qe1.leg_b.spin_in,
                              qe2.leg_a.spin_in, qe2.leg_b.spin_in)
            so, to, uo, vo = (qe1.leg_a.spin_ou, qe1.leg_b.spin_ou,
                              qe2.leg_a.spin_ou, qe2.leg_b.spin_ou)
            assert so + to >= 0 and uo + vo >= 0, (so, to, uo, vo)

            clsu = joincls([qe1.leg_a.cl, np.conj(qe2.leg_a.cl), uspin.spin_cls(si, ui, cls_aa)])
            cltv = joincls([qe1.leg_b.cl, np.conj(qe2.leg_b.cl), uspin.spin_cls(ti, vi, cls_bb)])
            R_sutv = joincls([wignerc(clsu, cltv, so, uo, to, vo, lmax_out=lmax_out), cL1, cL2])

            clsv = joincls([qe1.leg_a.cl, np.conj(qe2.leg_b.cl), uspin.spin_cls(si, vi, cls_ab)])
            cltu = joincls([qe1.leg_b.cl, np.conj(qe2.leg_a.cl), uspin.spin_cls(ti, ui, cls_ba)])
            R_sutv = R_sutv + joincls([wignerc(clsv, cltu, so, vo, to, uo, lmax_out=lmax_out),
                                       cL1, cL2])

            # (-s, -t) contractions
            sgnms = (-1) ** (si + so)
            sgnmt = (-1) ** (ti + to)
            clsu = joincls([sgnms * np.conj(qe1.leg_a.cl), np.conj(qe2.leg_a.cl),
                            uspin.spin_cls(-si, ui, cls_aa)])
            cltv = joincls([sgnmt * np.conj(qe1.leg_b.cl), np.conj(qe2.leg_b.cl),
                            uspin.spin_cls(-ti, vi, cls_bb)])
            R_msmtuv = joincls([wignerc(clsu, cltv, -so, uo, -to, vo, lmax_out=lmax_out),
                                cL1, cL2])

            clsv = joincls([sgnms * np.conj(qe1.leg_a.cl), np.conj(qe2.leg_b.cl),
                            uspin.spin_cls(-si, vi, cls_ab)])
            cltu = joincls([sgnmt * np.conj(qe1.leg_b.cl), np.conj(qe2.leg_a.cl),
                            uspin.spin_cls(-ti, ui, cls_ba)])
            R_msmtuv = R_msmtuv + joincls([wignerc(clsv, cltu, -so, vo, -to, uo,
                                                   lmax_out=lmax_out), cL1, cL2])

            sgn = (-1) ** (to + so)
            GG += 0.5 * R_sutv.real + 0.5 * sgn * R_msmtuv.real
            CC += 0.5 * R_sutv.real - 0.5 * sgn * R_msmtuv.real
            GC -= 0.5 * np.imag(R_sutv) + 0.5 * sgn * np.imag(R_msmtuv)
            CG += 0.5 * np.imag(R_sutv) - 0.5 * sgn * np.imag(R_msmtuv)
            if ret_terms:
                terms += [0.5 * R_sutv, 0.5 * sgn * R_msmtuv]
    return (GG, CC, GC, CG) if not ret_terms else (GG, CC, GC, CG, terms)
