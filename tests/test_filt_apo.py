"""Apodised-mask pseudo-inverse filtering library (IVFApoSepTP)."""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
from plancklens_tpu.ops.sht import gl_geometry
from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib, AlmMapLib
from plancklens_tpu.models.filt import IVFSepTP, IVFApoSepTP

LMAX = 64


def _setup():
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
    transf = np.ones(LMAX + 1)
    nlev_t, nlev_p = 30., 40.
    cmb = CMBUnlLib(cls, LMAX, fields='teb')
    sims = MapsNlevLib(cmb, transf, nlev_t, nlev_p)
    ftl = cli(cls['tt'][:LMAX + 1] + (nlev_t / 60. / 180. * np.pi) ** 2)
    fel = cli(cls['ee'][:LMAX + 1] + (nlev_p / 60. / 180. * np.pi) ** 2)
    fbl = cli(cls['bb'][:LMAX + 1] + (nlev_p / 60. / 180. * np.pi) ** 2)
    return cls, transf, sims, ftl, fel, fbl


def test_apo_unit_mask_matches_isotropic():
    """With a unit mask the apo library must reproduce the harmonic isotropic filter (the
    analysis of the synthesised map is exact on the GL grid). Pol is compared at l >= 2:
    the harmonic sims carry (unphysical) noise in the l < 2 pol modes which a spin-2 map
    cannot represent."""
    cls, transf, sims, ftl, fel, fbl = _setup()
    geom = gl_geometry(LMAX)
    maps = AlmMapLib(sims, geom, LMAX)
    iso = IVFSepTP(sims, transf, cls, ftl, fel, fbl)
    apo = IVFApoSepTP(maps, geom, np.ones((geom.nrings, geom.nphi)), cls, transf,
                      ftl, fel, fbl)
    ls, _ = ualm._lm_indices(LMAX)
    for get_iso, get_apo, lmin in [(iso.get_sim_tlm, apo.get_sim_tlm, 0),
                                   (iso.get_sim_elm, apo.get_sim_elm, 2),
                                   (iso.get_sim_blm, apo.get_sim_blm, 2)]:
        a, b = np.asarray(get_iso(3)), np.asarray(get_apo(3))
        sel = ls >= lmin
        scale = np.abs(a[sel]).max()
        assert np.abs(a[sel] - b[sel]).max() < 1e-7 * scale


def test_apo_masked_suppresses_power_by_fsky():
    """With a real apodised mask the pseudo-spectrum of the masked multipoles is
    suppressed by roughly fsky_2 = <apo^2>."""
    from plancklens_tpu.utils.cls import apodize_mask
    cls, transf, sims, ftl, fel, fbl = _setup()
    geom = gl_geometry(LMAX)
    maps = AlmMapLib(sims, geom, LMAX)
    mask = (np.abs(np.cos(geom.theta)) > 0.3).astype(float)[:, None] \
        * np.ones((geom.nrings, geom.nphi))
    apo_mask = apodize_mask(mask, geom, sigma_arcmin=600., lmax=LMAX)
    w2 = np.outer(geom.weight, np.full(geom.nphi, 1. / geom.nphi)) / 2.
    fsky2 = float(np.sum(w2 * np.asarray(apo_mask) ** 2))
    apo = IVFApoSepTP(maps, geom, apo_mask, cls, transf, ftl, fel, fbl)
    iso = IVFSepTP(sims, transf, cls, ftl, fel, fbl)
    sel = slice(10, LMAX - 10)
    r = []
    for idx in range(3):
        cl_m = np.asarray(ualm.alm2cl(apo.get_sim_tlm(idx), LMAX))
        cl_f = np.asarray(ualm.alm2cl(iso.get_sim_tlm(idx), LMAX))
        r.append(np.mean(cl_m[sel] / cl_f[sel]))
    ratio = np.mean(r)
    assert np.isfinite(ratio) and 0.5 * fsky2 < ratio < 1.5 * fsky2, (ratio, fsky2)
    # interface completeness for the QE layer
    assert apo.get_fmask().shape == (geom.nrings, geom.nphi)
    assert np.all(apo.get_ftl() == ftl) and np.all(apo.get_tal('t') == cli(transf))
    assert np.asarray(apo.get_sim_emliklm(0)).shape == np.asarray(apo.get_sim_elm(0)).shape
