"""Lensed-spectra operator vs the FFP10 ground truth (CAMB-produced), and the iterative-N0
forecast behaviour."""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile
from plancklens_tpu.ops.lensed_cls import lensed_cls
from plancklens_tpu.models.n0s import get_N0_iter

LM = 2048


def _unl():
    return camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lenspotentialCls.dat'), lmax=LM)


def test_lensed_cls_vs_ffp10():
    unl = _unl()
    target = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                      'FFP10_wdipole_lensedCls.dat'), lmax=LM - 200)
    out = lensed_cls(unl, unl['pp'], lmax_out=LM - 200, nterms=3)
    sel = slice(100, 1200)
    assert np.abs(out['tt'][sel] / target['tt'][sel] - 1.).max() < 5e-3
    assert np.abs(out['ee'][sel] / target['ee'][sel] - 1.).max() < 5e-3
    # lensed BB at l needs unlensed E far above l: restrict to the margin-safe range
    selb = slice(100, 800)
    assert np.abs(out['bb'][selb] / target['bb'][selb] - 1.).max() < 2e-2
    with np.errstate(invalid='ignore', divide='ignore'):
        te_err = np.abs(out['te'] - target['te']) / np.sqrt(target['tt'] * target['ee'])
    assert te_err[sel].max() < 2e-3


def test_n0_iter_decreases():
    unl = _unl()
    N0b, N0u = get_N0_iter('p_p', 1.0, 1.4, 2.0, unl, 30, 400, 2)
    vals = [n[80] for n in N0u]
    assert vals[1] < vals[0] and vals[2] <= vals[1] * 1.001, vals
    # iteration 0 equals the standard QE N0 scale (sanity: finite, positive)
    assert np.all(N0u[0][2:] > 0)
