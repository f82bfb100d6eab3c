"""Idealized full-sky parameter file (reference analogue: params/idealized_example.py).

Instantiates the standard pipeline libraries as module-level globals, exactly as the
reference's parameter-file contract: sims, ivfs, qlms_dd/ds/ss, qcls_dd/ds/ss, qresp_dd,
nhl_dd, n1_dd, and the sim-index sets. Import this module and hand it to
models.bandpowers.Binner, or drive it with examples/run_qlms.py.

Configuration: FFP10-like spectra, 35 uK-arcmin T noise (x sqrt(2) pol), isotropic
filtering, ptt/p_p/MV QEs. Scales are kept modest by default so the file runs anywhere;
raise LMAX_IVF/LMAX_QLM for production.
"""
import os
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli
from plancklens_tpu.models.sims import CMBUnlLib, MapsNlevLib
from plancklens_tpu.models.filt import IVFSepTP, IVFShuffle
from plancklens_tpu.models.qest import QELib
from plancklens_tpu.models.qecl import QeClLib
from plancklens_tpu.models.qresp import RespLib
from plancklens_tpu.models.nhl import NhlLib
from plancklens_tpu.models.n1 import N1Lib

LMAX_IVF = int(os.environ.get('PLK_LMAX_IVF', 512))
LMAX_QLM = int(os.environ.get('PLK_LMAX_QLM', 512))
LMIN_IVF = 10
NLEV_T = 35.
NLEV_P = 35. * np.sqrt(2.)
NSIMS = int(os.environ.get('PLK_NSIMS', 64))

# optional persistent product store: set PLK_CACHE_DIR to make every expensive product
# (QE alms, spectra, responses) restartable across runs (reference role: the lib_dir
# filesystem caches of params/idealized_example.py); unset -> in-memory caches.
# The cache root carries a configuration token so DIFFERENT configurations sharing one
# PLK_CACHE_DIR can never load each other's products (the hash_check guard's role).
_CACHE_DIR = os.environ.get('PLK_CACHE_DIR')
_CFG = 'ideal_l%d_lq%d_n%d' % (LMAX_IVF, LMAX_QLM, NSIMS)


def _cacher(sub):
    if _CACHE_DIR:
        from plancklens_tpu.utils.cachers import cacher_npy
        return cacher_npy(os.path.join(_CACHE_DIR, _CFG, sub))
    return None

cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
cl_unl = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lenspotentialCls.dat'))
cl_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'), lmax=LMAX_IVF)

transf = np.ones(LMAX_IVF + 1)  # idealized: unit beam, harmonic-space sims
nt2 = (NLEV_T / 60. / 180. * np.pi) ** 2
np2 = (NLEV_P / 60. / 180. * np.pi) ** 2
ftl = cli(cl_len['tt'] + nt2)
fel = cli(cl_len['ee'] + np2)
fbl = cli(cl_len['bb'] + np2)
for fl in (ftl, fel, fbl):
    fl[:LMIN_IVF] = 0.

# --- simulations (Gaussian skies with lensed spectra; see sims.CMBLenLib for remapped)
cmbs = CMBUnlLib(cl_len, LMAX_IVF, fields=('t', 'e', 'b'), seed=83)
sims = MapsNlevLib(cmbs, transf, NLEV_T, NLEV_P, seed=84)

# --- filtering
ivfs = IVFSepTP(sims, transf, cl_len, ftl, fel, fbl)
# plain dicts, not lambdas: IVFShuffle only folds dict idx-maps into its hashdict,
# so callable maps would leave qlms_ds/qlms_ss indistinguishable to hash_check and
# any hashdict-keyed cache (same convention as params/anisofilt_example.py)
ds_dict = {i: -1 for i in range(NSIMS)}             # all sims paired with the data leg
ss_dict = {i: (i + 1) % NSIMS for i in range(NSIMS)}  # sims paired with the next sim
ivfs_d = IVFShuffle(ivfs, ds_dict)
ivfs_s = IVFShuffle(ivfs, ss_dict)

# --- QEs and their spectra
qlms_dd = QELib(ivfs, ivfs, cl_len, LMAX_IVF, LMAX_QLM, cacher=_cacher('qlms_dd'))
qlms_ds = QELib(ivfs, ivfs_d, cl_len, LMAX_IVF, LMAX_QLM, cacher=_cacher('qlms_ds'))
qlms_ss = QELib(ivfs, ivfs_s, cl_len, LMAX_IVF, LMAX_QLM, cacher=_cacher('qlms_ss'))

mc_sims_bias = np.arange(NSIMS // 2)
mc_sims_var = np.arange(NSIMS // 2, NSIMS)
mc_sims_mf_dd = mc_sims_bias
mc_sims_mf_ds = np.array([], dtype=int)
mc_sims_mf_ss = np.array([], dtype=int)

qcls_dd = QeClLib(qlms_dd, qlms_dd, mc_sims_mf_dd, lmax_qlm=LMAX_QLM,
                  cacher=_cacher('qcls_dd'))
qcls_ds = QeClLib(qlms_ds, qlms_ds, mc_sims_mf_ds, lmax_qlm=LMAX_QLM,
                  cacher=_cacher('qcls_ds'))
qcls_ss = QeClLib(qlms_ss, qlms_ss, mc_sims_mf_ss, lmax_qlm=LMAX_QLM,
                  cacher=_cacher('qcls_ss'))

# --- analytic layers
fal = {'tt': ftl, 'ee': fel, 'bb': fbl}
qresp_dd = RespLib(LMAX_IVF, cl_len, cl_len, fal, LMAX_QLM, cacher=_cacher('qresp'))
nhl_dd = NhlLib(ivfs, cl_len, LMAX_QLM, cacher=_cacher('nhl'))
n1_dd = N1Lib(cl_len['tt'], cl_len['te'], cl_len['ee'], lmaxphi=2048)
