"""GMV end-to-end with joint T/P filtering: the 'p' QE on jointly-filtered Gaussian skies
has spectrum == semi-analytic N0 with the joint-TP filtered spectra."""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cl_inverse, cls_dot, alm as ualm
from plancklens_tpu.models import nhl
from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib
from plancklens_tpu.models.filt import IVFJTP
from plancklens_tpu.models.qest import QELib

LMAX = 64
LMIN = 8
NSIMS = 4


def test_gmv_spectrum_matches_n0():
    cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
    cls_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    transf = np.ones(LMAX + 1)
    nt2 = (35. / 60. / 180. * np.pi) ** 2
    np2 = 2 * nt2
    cls_dat = {'tt': cls_len['tt'] + nt2, 'ee': cls_len['ee'] + np2,
               'bb': cls_len['bb'] + np2, 'te': np.copy(cls_len['te'])}
    fal = cl_inverse(cls_dat)
    for cl in fal.values():
        cl[:LMIN] = 0.
    cmb = CMBUnlLib(cls_len, LMAX, fields=('t', 'e', 'b'), seed=21)
    sims = MapsNlevLib(cmb, transf, 35., 35. * np.sqrt(2.), seed=22)
    ivfs = IVFJTP(sims, transf, cls_len, fal)
    qlib = QELib(ivfs, ivfs, cls_len, LMAX, LMAX)
    qlms = np.asarray(qlib.get_sim_qlm_batch('p', np.arange(NSIMS)))
    cls_q = np.asarray(ualm.alm2cl(qlms, LMAX)).mean(axis=0)
    # expected: N0 with cls_ivfs = fal (filter matches data) for the GMV key
    cls_ivfs = cls_dot([fal, cls_dat, fal], ret_dict=True)
    for cl in cls_ivfs.values():
        cl[:LMIN] = 0.
    NG = nhl.get_nhl('p', 'p', cls_len, cls_ivfs, LMAX, LMAX, lmax_out=LMAX)[0]
    sel = slice(10, 55)
    ratio = cls_q[sel] / NG[sel]
    assert abs(ratio.mean() - 1.) < 0.1, ratio.mean()
