"""The reference's own acceptance test, rebuilt: with filter == weights == data spectra, the
QE is optimally filtered and the semi-analytic N0 equals the response (N_L = 1/R_L after
normalisation), to 1e-6 relative; G/C cross terms vanish (reference: tests/test_w.py).

This exercises get_qes -> spin_cls/get_spin_matrix -> wignerc -> the Wigner-d kernel with no
map data.
"""
import os
import numpy as np
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, cl_inverse
from plancklens_tpu.models import nhl, qresp


def gauss_beam(fwhm_rad, lmax):
    ls = np.arange(lmax + 1)
    sigma2 = (fwhm_rad / np.sqrt(8. * np.log(2.))) ** 2
    return np.exp(-0.5 * ls * (ls + 1) * sigma2)


LMAX_IVF = 256
LMIN_IVF = 80


def _setup():
    cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
    cls_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'))
    nlev_t, nlev_p, beam_fwhm = 35., 35. * np.sqrt(2.), 6.
    transf = gauss_beam(beam_fwhm / 60. / 180. * np.pi, LMAX_IVF)
    nt2 = (nlev_t / 60. / 180. * np.pi) ** 2 / transf ** 2
    np2 = (nlev_p / 60. / 180. * np.pi) ** 2 / transf ** 2
    fal_sepTP = {'tt': cli(cls_len['tt'][:LMAX_IVF + 1] + nt2),
                 'ee': cli(cls_len['ee'][:LMAX_IVF + 1] + np2),
                 'bb': cli(cls_len['bb'][:LMAX_IVF + 1] + np2)}
    cls_ivfs_sepTP = {'tt': fal_sepTP['tt'].copy(),
                      'ee': fal_sepTP['ee'].copy(),
                      'bb': fal_sepTP['bb'].copy(),
                      'te': cls_len['te'][:LMAX_IVF + 1] * fal_sepTP['tt'] * fal_sepTP['ee']}
    cls_dat = {'tt': cls_len['tt'][:LMAX_IVF + 1] + nt2,
               'ee': cls_len['ee'][:LMAX_IVF + 1] + np2,
               'bb': cls_len['bb'][:LMAX_IVF + 1] + np2,
               'te': np.copy(cls_len['te'][:LMAX_IVF + 1])}
    fal_jtTP = cl_inverse(cls_dat)
    cls_ivfs_jtTP = cl_inverse(cls_dat)
    for cls in [fal_sepTP, fal_jtTP, cls_ivfs_sepTP, cls_ivfs_jtTP]:
        for cl in cls.values():
            cl[:max(1, LMIN_IVF)] *= 0.
    return cls_len, fal_sepTP, cls_ivfs_sepTP, fal_jtTP, cls_ivfs_jtTP


CLS_LEN, FAL_SEP, IVFS_SEP, FAL_JT, IVFS_JT = _setup()


@pytest.mark.parametrize('ksource', ['p', 'f'])
@pytest.mark.parametrize('maps', ['tt', '_p'])
def test_n0_equals_response_sepTP(ksource, maps):
    qe_key = ksource + maps
    NG, NC, NGC, NCG = nhl.get_nhl(qe_key, qe_key, CLS_LEN, IVFS_SEP,
                                   LMAX_IVF, LMAX_IVF, lmax_out=LMAX_IVF)
    RG, RC, RGC, RCG = qresp.get_response(qe_key, LMAX_IVF, ksource, CLS_LEN, CLS_LEN,
                                          FAL_SEP, lmax_qlm=LMAX_IVF)
    assert np.allclose(NG[1:], RG[1:], rtol=1e-6), qe_key
    assert np.allclose(NC[2:], RC[2:], rtol=1e-6), qe_key
    assert np.all(NCG == 0.) and np.all(NGC == 0.)
    assert np.all(RCG == 0.) and np.all(RGC == 0.)


@pytest.mark.parametrize('ksource', ['p', 'f'])
def test_n0_equals_response_MV_sepTP(ksource):
    # MV key with separate T/P filtering: G/C cross terms vanish, but N0 != R in general;
    # still check they are finite and the GC/CG terms vanish as in the reference test
    qe_key = ksource
    NG, NC, NGC, NCG = nhl.get_nhl(qe_key, qe_key, CLS_LEN, IVFS_SEP,
                                   LMAX_IVF, LMAX_IVF, lmax_out=LMAX_IVF)
    RG, RC, RGC, RCG = qresp.get_response(qe_key, LMAX_IVF, ksource, CLS_LEN, CLS_LEN,
                                          FAL_SEP, lmax_qlm=LMAX_IVF)
    assert np.all(np.isfinite(NG)) and np.all(np.isfinite(RG))
    assert np.all(NCG == 0.) and np.all(NGC == 0.)
    assert np.all(RCG == 0.) and np.all(RGC == 0.)


@pytest.mark.parametrize('ksource', ['p', 'f'])
def test_n0_equals_response_GMV_jtTP(ksource):
    # joint TEB filtering: optimal-filter identity holds for the GMV key
    NG, NC, NGC, NCG = nhl.get_nhl(ksource, ksource, CLS_LEN, IVFS_JT,
                                   LMAX_IVF, LMAX_IVF, lmax_out=LMAX_IVF)
    RG, RC, RGC, RCG = qresp.get_response(ksource, LMAX_IVF, ksource, CLS_LEN, CLS_LEN,
                                          FAL_JT, lmax_qlm=LMAX_IVF)
    assert np.allclose(NG[1:], RG[1:], rtol=1e-6), ksource
    assert np.allclose(NC[2:], RC[2:], rtol=1e-6), ksource
    assert np.all(NCG == 0.) and np.all(NGC == 0.)
    assert np.all(RCG == 0.) and np.all(RGC == 0.)
