"""Lensed-spectra operator vs the FFP10 ground truth (CAMB-produced), and anchors for the
iterative-N0 forecast (reference capability: plancklens/n0s.py get_N0_iter, which leans on
camb.correlations.lensed_cls; here both legs are self-contained).

The N0_iter anchor arrays are pinned from a trusted f64 run of this package
(2026-08-19), shown platform-robust (TPU-relay vs CPU agree to ~6e-7 relative) and
Cgl,2-series-converged (nterms=2 vs 3 moves them by <2e-9 [ptt] / <5e-6 [p_p]
relative) — the role of the reference's CAMB-backed outputs, which cannot be
regenerated here (no camb).
"""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile
from plancklens_tpu.ops.lensed_cls import lensed_cls
from plancklens_tpu.models.n0s import get_N0_iter


def _unl(lmax):
    return camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lenspotentialCls.dat'), lmax=lmax)


def test_lensed_cls_vs_ffp10():
    # lensed BB at any l draws on unlensed EE out to the damping tail: the input band
    # limit (4000 here), not the Cgl,2 order, is what buys BB accuracy (see the
    # ops/lensed_cls module docstring; truncating the input at 2048 inflates BB to ~2%)
    unl = _unl(4000)
    target = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                      'FFP10_wdipole_lensedCls.dat'), lmax=1600)
    out = lensed_cls(unl, unl['pp'], lmax_out=1600, nterms=2)
    sel = slice(100, 1601)
    assert np.abs(out['tt'][sel] / target['tt'][sel] - 1.).max() < 1e-3
    assert np.abs(out['ee'][sel] / target['ee'][sel] - 1.).max() < 1e-3
    assert np.abs(out['bb'][100:800] / target['bb'][100:800] - 1.).max() < 5e-4
    assert np.abs(out['bb'][800:1601] / target['bb'][800:1601] - 1.).max() < 2e-3
    with np.errstate(invalid='ignore', divide='ignore'):
        te_err = np.abs(out['te'] - target['te']) / np.sqrt(target['tt'] * target['ee'])
    assert te_err[sel].max() < 1e-3


def test_n0_iter_decreases():
    unl = _unl(2048)
    N0b, N0u = get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 400, 2)
    vals = [n[80] for n in N0u]
    assert vals[1] < vals[0] and vals[2] <= vals[1] * 1.001, vals
    # iteration 0 equals the standard QE N0 scale (sanity: finite, positive)
    assert np.all(N0u[0][2:] > 0)


# --- pinned get_N0_iter anchors (grad + curl, itermax=3) ---------------------------
_LS = np.array([2, 20, 50, 100, 200, 400, 700])

_ANCHORS = {
    'ptt': {
        ('grad', 0): [1.884047093661e-06, 3.184385058014e-10, 9.620468472350e-12,
                      8.502938736896e-13, 1.455704786741e-13, 1.903475242259e-14,
                      1.138606614453e-14],
        ('grad', 1): [1.883839476912e-06, 3.184060378084e-10, 9.619563249185e-12,
                      8.502290581208e-13, 1.455644192012e-13, 1.903468884516e-14,
                      1.138594232857e-14],
        ('grad', 3): [1.883839459964e-06, 3.184060351552e-10, 9.619563175094e-12,
                      8.502290528061e-13, 1.455644187034e-13, 1.903468883988e-14,
                      1.138594231847e-14],
        ('curl', 0): [3.754141127732e-06, 5.268353435758e-10, 1.517250694354e-11,
                      1.136083100758e-12, 1.163083073247e-13, 3.509565657258e-14,
                      3.113265734504e-12],
        ('curl', 1): [3.753851187265e-06, 5.267949551034e-10, 1.517139102146e-11,
                      1.136008158394e-12, 1.163020652975e-13, 3.509377936052e-14,
                      3.112869798556e-12],
        ('curl', 3): [3.753851163604e-06, 5.267949518037e-10, 1.517139093017e-11,
                      1.136008152252e-12, 1.163020647849e-13, 3.509377920624e-14,
                      3.112869766314e-12],
    },
    'p_p': {
        ('grad', 0): [2.523255741876e-08, 3.679192358341e-12, 1.081739726579e-13,
                      7.958911126635e-15, 5.913877446438e-16, 2.503052550153e-16,
                      1.108076798729e-16],
        ('grad', 1): [2.181706813763e-08, 3.175716873893e-12, 9.332606707718e-14,
                      6.859195374165e-15, 5.140197452768e-16, 2.218977047612e-16,
                      9.531958385606e-17],
        ('grad', 3): [2.146828618205e-08, 3.124251763704e-12, 9.179701226533e-14,
                      6.743886446516e-15, 5.056415943368e-16, 2.188494030378e-16,
                      9.378549370044e-17],
        ('curl', 0): [6.542864584401e-09, 1.236651597685e-12, 3.704988366551e-14,
                      2.997329781402e-15, 3.727136323977e-16, 4.965762153542e-16,
                      1.048850102125e-15],
        ('curl', 1): [5.628134762512e-09, 1.063321053805e-12, 3.181390011087e-14,
                      2.567490773142e-15, 3.190484170268e-16, 4.268238581092e-16,
                      9.025926044513e-16],
        ('curl', 3): [5.535263845834e-09, 1.045711483803e-12, 3.128156007557e-14,
                      2.523729490170e-15, 3.135591394864e-16, 4.197837706971e-16,
                      8.881794975063e-16],
    },
}


def _check_n0_iter_anchor(key):
    unl = _unl(2448)
    Nb, Nu, Ncu, Ncb = get_N0_iter(key, 1.0, 1.4, 2.0, unl, 30, 400, 3, ret_curl=True)
    # with cls_unl_dat defaulting to the fiducial, biased == unbiased exactly
    for it in (0, 1, 3):
        np.testing.assert_array_equal(Nb[it], Nu[it])
        np.testing.assert_array_equal(Ncu[it], Ncb[it])
        np.testing.assert_allclose(np.asarray(Nu[it])[_LS], _ANCHORS[key][('grad', it)],
                                   rtol=1e-4, err_msg=f'{key} grad iter {it}')
        np.testing.assert_allclose(np.asarray(Ncu[it])[_LS], _ANCHORS[key][('curl', it)],
                                   rtol=1e-4, err_msg=f'{key} curl iter {it}')
    # the MAP iterations strictly improve on the QE (iter 0) and converge
    assert np.all(np.asarray(Nu[3])[_LS] <= np.asarray(Nu[0])[_LS])
    rel13 = np.abs(np.asarray(Nu[3])[_LS] / np.asarray(Nu[1])[_LS] - 1.)
    assert rel13.max() < 0.02, rel13


def test_n0_iter_anchor_ptt():
    _check_n0_iter_anchor('ptt')


def test_n0_iter_anchor_p_p():
    _check_n0_iter_anchor('p_p')
