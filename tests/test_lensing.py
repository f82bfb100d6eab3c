"""Lensing remap operator: interpolation accuracy, and the end-to-end physics gold test —
the QE on lensed skies cross-correlates with the input potential at the response level."""
import os
import numpy as np
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
from plancklens_tpu.ops.sht import SHT, gl_geometry
from plancklens_tpu.ops.lensing import Lensing
from plancklens_tpu.models import qresp
from plancklens_tpu.models.qest import eval_qe

LMAX = 96


def _cls():
    d = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                 'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    dp = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                  'FFP10_wdipole_lenspotentialCls.dat'), lmax=LMAX)
    return d, dp


def _random_alm(cl, lmax, seed):
    rng = np.random.RandomState(seed)
    ls, ms = ualm._lm_indices(lmax)
    a = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))) / np.sqrt(2.)
    a[ms == 0] = a[ms == 0].real * np.sqrt(2.)
    return a * np.sqrt(cl[ls])


def test_zero_deflection_is_identity():
    cls, _ = _cls()
    geom = gl_geometry(LMAX)
    lens = Lensing(geom, LMAX, oversample=4.0, order=9)
    tlm = _random_alm(cls['tt'], LMAX, 0)
    plm = np.zeros_like(tlm)
    lensed = np.asarray(lens.alm2lenmap(tlm, plm))[0]
    direct = np.asarray(SHT(geom, LMAX).alm2map(tlm))
    err = np.abs(lensed - direct).max() / np.abs(direct).max()
    assert err < 3e-6, err


def test_zero_deflection_spin2():
    cls, _ = _cls()
    geom = gl_geometry(LMAX)
    lens = Lensing(geom, LMAX, oversample=4.0, order=9)
    elm = _random_alm(cls['ee'], LMAX, 1)
    ls, _ = ualm._lm_indices(LMAX)
    elm[ls < 2] = 0.
    plm = np.zeros_like(elm)
    q, u = lens.alm2lenmap_spin((elm, np.zeros_like(elm)), plm, 2)
    qd, ud = SHT(geom, LMAX).alm2map_spin((elm, np.zeros_like(elm)), 2)
    err = max(np.abs(np.asarray(q)[0] - np.asarray(qd)).max(),
              np.abs(np.asarray(u)[0] - np.asarray(ud)).max()) / np.abs(np.asarray(qd)).max()
    assert err < 3e-6, err


def test_qe_response_to_lensing_matches_qresp():
    """THE end-to-end physics test: lens skies through the real remap operator with a known
    phi mode; the antithetic combination (QE[T lensed by +phi] - QE[T lensed by -phi])/2
    cancels the Gaussian QE noise exactly and must equal R_L phi_LM per realisation up to
    the (small) connected fluctuation — validating lensing op + filtering + QE + qresp
    together (reference acceptance physics: examples/lensingrec_quickstart.ipynb)."""
    cls_len, _ = _cls()
    unl = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lenspotentialCls.dat'), lmax=LMAX)
    geom = gl_geometry(LMAX + 32)
    lens = Lensing(geom, LMAX, lmax_p=LMAX, oversample=4.0, order=9)
    sht = SHT(geom, LMAX)
    ftl = cli(cls_len['tt'])
    ftl[:2] = 0.
    L0, M0 = 20, 5
    A = 1e-4  # linear regime; antithetic combination removes O(phi^0) noise exactly
    plm = np.zeros(ualm.getsize(LMAX), dtype=complex)
    plm[ualm.getidx(LMAX, L0, M0)] = A * (1 + 0.3j)
    nsims = 2
    tunl = np.stack([_random_alm(unl['tt'], LMAX, 7 * i) for i in range(nsims)])
    Bsum = 0.
    for sgn in (+1., -1.):
        tmaps = np.asarray(lens.alm2lenmap(tunl, np.broadcast_to(sgn * plm,
                                                                 (nsims, len(plm)))))
        tobs = np.asarray(sht.map2alm(tmaps))
        bart = np.asarray(ualm.almxfl(tobs, LMAX, ftl))
        Z = np.zeros_like(bart)
        qlm, _ = eval_qe('ptt', LMAX, cls_len,
                         lambda f, b=bart, z=Z: {'t': b, 'e': z, 'b': z}[f], LMAX)
        Bsum = Bsum + sgn * np.asarray(qlm)
    B = 0.5 * Bsum.mean(axis=0)
    RG = qresp.get_response('ptt', LMAX, 'p', cls_len, cls_len,
                            {'tt': ftl, 'ee': 0 * ftl, 'bb': 0 * ftl}, lmax_qlm=LMAX)[0]
    expected = RG[L0] * plm[ualm.getidx(LMAX, L0, M0)]
    got = B[ualm.getidx(LMAX, L0, M0)]
    assert abs(got / expected - 1.) < 0.15, (got, expected)
