r"""Masked curved-sky reconstruction parameter file — fully self-contained.

The analog of the reference's anisotropic-filtering example (reference:
params/anisofilt_example.py:1-146), with the external NERSC products replaced by the
framework's own simulation stack so the complete chain runs anywhere:
  * lensed CMB skies from the deflection-remap operator (sims.CMBLenLib)
  * beam + homogeneous white pixel noise on the ring grid (sims.MapsLenNlevLib)
  * a synthetic galactic-band + holes mask
  * masked CG inverse-variance filtering (cinv), QE / qecl / response / N0 / N1
    libraries wired exactly as the reference file documents (ivfs, qlms_{dd,ds,ss},
    qcls_{dd,ds,ss}, qresp_dd, nhl_dd, n1_dd).

Set PLK_ANISO_LMAX to shrink the configuration (tests run the full chain at lmax 48);
default matches the reference's Planck-like sizes.
"""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile
from plancklens_tpu.models.n0s import gauss_beam
from plancklens_tpu.ops.sht import gl_geometry
from plancklens_tpu.models import qresp, nhl
from plancklens_tpu.models.sims import CMBLenLib, MapsLenNlevLib
from plancklens_tpu.models.cinv import CinvT, CinvP, IVFCinv
from plancklens_tpu.models.filt import IVFFtl, IVFShuffle
from plancklens_tpu.models.qest import QELib
from plancklens_tpu.models.qecl import QeClLib
from plancklens_tpu.models.n1 import N1Lib

# --------------------------------------------------------------- analysis constants
lmax_ivf = int(os.environ.get('PLK_ANISO_LMAX', 2048))
lmin_ivf = max(2, lmax_ivf // 20)
lmax_qlm = lmax_ivf
nlev_t = float(os.environ.get('PLK_ANISO_NLEV_T', 35.))
nlev_p = float(os.environ.get('PLK_ANISO_NLEV_P', 55.))
nsims = int(os.environ.get('PLK_ANISO_NSIMS', 300))

cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
cl_unl = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lenspotentialCls.dat'))
cl_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'))
cl_weight = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'))
cl_weight['bb'] *= 0.

# 5-arcmin beam (gauss_beam takes the FWHM in arcminutes)
transf = gauss_beam(5., lmax=lmax_ivf)

# ------------------------------------------------------------------ sims on the grid
geom = gl_geometry(lmax_ivf)
cmb_len = CMBLenLib(cl_unl, lmax_ivf, geom, seed=0,
                    dlmax=min(128, max(16, lmax_ivf // 4)))
sims = MapsLenNlevLib(cmb_len, transf, nlev_t, nlev_p, seed=2000)

# ------------------------------------------------- synthetic mask + masked filtering
# galactic band cut plus a few circular 'point source' holes (the reference uses the
# Planck lensing mask from disk here; any (nrings, nphi) mask works)
z = np.cos(geom.theta)[:, None]
phi = (2. * np.pi * np.arange(geom.nphi) / geom.nphi)[None, :]
mask = (np.abs(z) > 0.15).astype(float) * np.ones((geom.nrings, geom.nphi))
for zc, pc, r in ((0.6, 1.0, 0.05), (-0.5, 4.0, 0.04), (0.3, 2.5, 0.03)):
    mask *= ((z - zc) ** 2 + (np.cos(phi) - np.cos(pc)) ** 2 * (1 - z ** 2)
             + (np.sin(phi) - np.sin(pc)) ** 2 * (1 - z ** 2) > r ** 2)

ninv_t = sims.ninv_t() * mask
ninv_p = sims.ninv_p() * mask

# PLK_CACHE_DIR makes filtered alms + CG solutions restartable (warm starts on re-runs).
# The cache root carries a configuration token so DIFFERENT configurations sharing one
# PLK_CACHE_DIR (e.g. several test scales) can never load each other's products — the
# role of the reference's hash_check guard (plancklens/utils.py:144-180).
_CACHE_DIR = os.environ.get('PLK_CACHE_DIR')
_CFG = 'aniso_l%d_n%d_t%g_p%g' % (lmax_ivf, nsims, nlev_t, nlev_p)


def _cacher(sub):
    if _CACHE_DIR:
        from plancklens_tpu.utils.cachers import cacher_npy
        return cacher_npy(os.path.join(_CACHE_DIR, _CFG, sub))
    return None


cinv_t = CinvT(lmax_ivf, geom, cl_len, transf, ninv_t,
               marge_monopole=True, marge_dipole=True, eps_min=1e-5,
               dense_cacher=_cacher('dense'))
cinv_p = CinvP(lmax_ivf, geom, cl_len, transf, ninv_p, eps_min=1e-5,
               lmax_dense=32,  # coupled E/B dense block (see docs/PERF.md table)
               dense_cacher=_cacher('dense'))
ivfs_raw = IVFCinv(cinv_t, cinv_p, sims, cl_len, cacher=_cacher('ivfs'),
                   soltn_cacher=_cacher('cg_soltns'))

ls = np.arange(lmax_ivf + 1)
ftl = (ls >= lmin_ivf) * 1.
fel = (ls >= lmin_ivf) * 1.
fbl = (ls >= lmin_ivf) * 1.
ivfs = IVFFtl(ivfs_raw, ftl, fel, fbl)

# ------------------------------------------------------ shuffled pairs (MCN0 / RDN0)
# global idx -> idx+1 roll (the reference's blocks-of-60 variant degenerates to the
# identity at small nsims, which would silently turn ss spectra into dd spectra)
ss_dict = {i: (i + 1) % nsims for i in range(nsims)}
ds_dict = {k: -1 for k in range(nsims)}
ivfs_d = IVFShuffle(ivfs, ds_dict)
ivfs_s = IVFShuffle(ivfs, ss_dict)

# --------------------------------------------------------------------- QE libraries
qlms_dd = QELib(ivfs, ivfs, cl_weight, lmax_ivf, lmax_qlm, cacher=_cacher('qlms_dd'))
qlms_ds = QELib(ivfs, ivfs_d, cl_weight, lmax_ivf, lmax_qlm, cacher=_cacher('qlms_ds'))
qlms_ss = QELib(ivfs, ivfs_s, cl_weight, lmax_ivf, lmax_qlm, cacher=_cacher('qlms_ss'))

mc_sims_bias = np.arange(nsims // 5, dtype=int)
mc_sims_var = np.arange(nsims // 5, nsims, dtype=int)
mc_sims_mf_dd = mc_sims_bias    # parfile contract: the driver's mf stage reads this

qcls_dd = QeClLib(qlms_dd, qlms_dd, mc_sims_bias)
qcls_ds = QeClLib(qlms_ds, qlms_ds, np.array([]))
qcls_ss = QeClLib(qlms_ss, qlms_ss, np.array([]))

# cross-spectra of the reconstructions with the known input phi of each lensed sim
# (consumed by bandpowers.Binner.get_ampl_x_input; the reference's optional
# qlms_x_in hook, which it only wires on NERSC)
from plancklens_tpu.models.qecl import InputPlmLib
qlms_x_in = QeClLib(qlms_dd, InputPlmLib(cmb_len, lmax_qlm), np.array([]))

# -------------------------------------------------------- response / N0 / N1
fal = {'tt': np.nan_to_num(ftl / (cl_len['tt'][:lmax_ivf + 1]
                                  + (nlev_t / 60. / 180. * np.pi) ** 2 / transf ** 2)),
       'ee': np.nan_to_num(fel / (cl_len['ee'][:lmax_ivf + 1]
                                  + (nlev_p / 60. / 180. * np.pi) ** 2 / transf ** 2)),
       'bb': np.nan_to_num(fbl / (cl_len['bb'][:lmax_ivf + 1]
                                  + (nlev_p / 60. / 180. * np.pi) ** 2 / transf ** 2))}

qresp_dd = qresp.RespLib(lmax_ivf, cl_weight, cl_len, fal, lmax_qlm)
nhl_dd = nhl.NhlLib(ivfs, cl_weight, lmax_qlm, resplib=qresp_dd)
n1_dd = N1Lib(cl_len['tt'], cl_len['te'], cl_len['ee'],
              lmaxphi=min(2500, 2 * lmax_ivf), dL=10, lps=None)
