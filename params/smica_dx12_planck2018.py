r"""Planck 2018 SMICA DX12 lensing-reconstruction parameter file (TPU pipeline).

The analog of the reference's production parameter file (reference:
params/smicadx12_planck2018.py:1-116): masked conjugate-gradient inverse-variance
filtering of the SMICA CMB map and FFP10 simulations, isotropic post-filter rescaling,
the data/sim (ds) and sim/sim (ss) shuffled QE pairs for the MC-N0 debiaser, and the
response / semi-analytic-N0 / N1 libraries.

Differences from the reference are the TPU-native ones:
  * no filesystem rendezvous — libraries recompute (jit-cached) or use in-memory/npy
    cachers rather than FITS caches on a cluster filesystem;
  * the cinv filters run the PCG solver as one jitted lax.while_loop on a ring grid
    (the Planck mask and variance maps are resampled onto it with
    ops.sht.healpix.resample_to_rings);
  * batched evaluation: QE maps for many sims are one batched pipeline call
    (QELib.get_sim_qlm_batch), replacing the reference's per-index MPI loop.

External inputs (the Planck data products) are looked up under $PLK_PLANCK_DATA:
    smica_dx12/sim_{t,e,b}lm_{0000..0299,dat}.fits   (healpy alm files, utils.fitsio)
    lensing_mask.fits                                 (RING healpix map)
Import works without them; touching the data-dependent libraries without the files
raises with the expected path in the message.
"""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile
from plancklens_tpu.utils.fitsio import read_map
from plancklens_tpu.models.n0s import gauss_beam
from plancklens_tpu.ops.sht import gl_geometry
from plancklens_tpu.ops.sht.healpix import pixwin, resample_to_rings
from plancklens_tpu.models import qresp, nhl
from plancklens_tpu.models.sims import ExternalAlmLib, AlmMapLib
from plancklens_tpu.models.cinv import CinvT, CinvP, IVFCinv
from plancklens_tpu.models.filt import IVFFtl
from plancklens_tpu.models.qest import QELib
from plancklens_tpu.models.qecl import QeClLib
from plancklens_tpu.models.n1 import N1Lib

# ---------------------------------------------------------------- analysis constants
lmax_ivf = 2048
lmin_ivf = 100
lmax_qlm = 4096
nside = 2048
nlev_t = 35.   # uK amin
nlev_p = 55.
nsims = 300

DATA = os.environ.get('PLK_PLANCK_DATA', '/data/planck2018')
cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')

cl_unl = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lenspotentialCls.dat'))
cl_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'))
cl_weight = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'))
cl_weight['bb'] *= 0.

# 5' beam x pixel window (reference: params/smicadx12_planck2018.py:37;
# gauss_beam takes the FWHM in arcminutes)
transf = gauss_beam(5., lmax=lmax_ivf) * pixwin(nside, lmax_ivf)

# ------------------------------------------------------------------- sims (FFP10)
# observed alms (hp.map2alm of the SMICA map / FFP10 sims, exported as healpy FITS);
# AlmMapLib synthesises the observed sky on the solver grid for the masked filters
sims_alm = ExternalAlmLib(os.path.join(DATA, 'smica_dx12'), prefix='sim', ext='fits')

# ------------------------------------------------------------- masked cinv filtering
# ring grid carrying the masked solve; 3 nside rings resolve the nside=2048 mask
geom = gl_geometry(lmax_ivf + 512)


def _ninv(nlev):
    """Inverse noise per steradian times the lensing mask, resampled to the ring grid."""
    vmap = 1. / (nlev / 60. / 180. * np.pi) ** 2
    fn = os.path.join(DATA, 'lensing_mask.fits')
    if not os.path.exists(fn):
        raise FileNotFoundError('Planck lensing mask expected at %s '
                                '(set $PLK_PLANCK_DATA)' % fn)
    mask = read_map(fn)
    return vmap * resample_to_rings(mask, nside, geom)


class _Lazy:
    """Defer data-dependent construction to first use (import must not touch $DATA)."""

    def __init__(self, build):
        self._build = build
        self._obj = None

    def __getattr__(self, name):
        if self._obj is None:
            self._obj = self._build()
        return getattr(self._obj, name)


cinv_t = _Lazy(lambda: CinvT(lmax_ivf, geom, cl_len, transf, _ninv(nlev_t),
                             marge_monopole=True, marge_dipole=True, eps_min=1e-5))
cinv_p = _Lazy(lambda: CinvP(lmax_ivf, geom, cl_len, transf, _ninv(nlev_p),
                             eps_min=1e-5))
sims = _Lazy(lambda: AlmMapLib(sims_alm, geom, lmax_ivf))
ivfs_raw = _Lazy(lambda: IVFCinv(cinv_t, cinv_p, sims, cl_len))

# isotropic rescaling of the filtered alms (reference: lines 70-74 load the empirical
# ftl/fel/fbl; without the Planck auxiliary files the fiducial ones are used)
ls = np.arange(lmax_ivf + 1)
ftl_rs = (ls >= lmin_ivf) * 1.
fel_rs = (ls >= lmin_ivf) * 1.
fbl_rs = (ls >= lmin_ivf) * 1.
ivfs = _Lazy(lambda: IVFFtl(ivfs_raw, ftl_rs, fel_rs, fbl_rs))

# ------------------------------------------------------ shuffled pairs for MC-N0 (RDN0)
# ss: idx -> idx+1 in blocks of 60; ds: every sim index -> the data map
# (reference: params/smicadx12_planck2018.py:77-84)
ss_dict = {k: v for i in range(5)
           for k, v in zip(range(i * 60, (i + 1) * 60),
                           np.roll(np.arange(i * 60, (i + 1) * 60), -1))}
ds_dict = {k: -1 for k in range(nsims)}

from plancklens_tpu.models.filt import IVFShuffle
ivfs_d = _Lazy(lambda: IVFShuffle(ivfs, ds_dict))
ivfs_s = _Lazy(lambda: IVFShuffle(ivfs, ss_dict))


# --------------------------------------------------------------------- QE libraries
qlms_dd = _Lazy(lambda: QELib(ivfs, ivfs, cl_weight, lmax_ivf, lmax_qlm))
qlms_ds = _Lazy(lambda: QELib(ivfs, ivfs_d, cl_weight, lmax_ivf, lmax_qlm))
qlms_ss = _Lazy(lambda: QELib(ivfs, ivfs_s, cl_weight, lmax_ivf, lmax_qlm))

mc_sims_bias = np.arange(60, dtype=int)
mc_sims_var = np.arange(60, 300, dtype=int)
mc_sims_mf_dd = mc_sims_bias
mc_sims_mf_ds = np.array([])
mc_sims_mf_ss = np.array([])

qcls_dd = _Lazy(lambda: QeClLib(qlms_dd, qlms_dd, mc_sims_mf_dd))
qcls_ds = _Lazy(lambda: QeClLib(qlms_ds, qlms_ds, mc_sims_mf_ds))
qcls_ss = _Lazy(lambda: QeClLib(qlms_ss, qlms_ss, mc_sims_mf_ss))

# ---------------------------------- response / N1 (data-independent), N0 (per-sim)
fal = {'tt': np.nan_to_num(ftl_rs / (cl_len['tt'][:lmax_ivf + 1]
                                     + (nlev_t / 60. / 180. * np.pi) ** 2
                                     / transf ** 2)),
       'ee': np.nan_to_num(fel_rs / (cl_len['ee'][:lmax_ivf + 1]
                                     + (nlev_p / 60. / 180. * np.pi) ** 2
                                     / transf ** 2)),
       'bb': np.nan_to_num(fbl_rs / (cl_len['bb'][:lmax_ivf + 1]
                                     + (nlev_p / 60. / 180. * np.pi) ** 2
                                     / transf ** 2))}

qresp_dd = qresp.RespLib(lmax_ivf, cl_weight, cl_len, fal, lmax_qlm)
nhl_dd = _Lazy(lambda: nhl.NhlLib(ivfs, cl_weight, lmax_qlm, resplib=qresp_dd))
n1_dd = N1Lib(cl_len['tt'], cl_len['te'], cl_len['ee'],
              lmaxphi=2500, dL=10, lps=None)
