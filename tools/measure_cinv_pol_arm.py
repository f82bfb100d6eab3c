"""Masked polarisation (coupled E/B) cinv arms, one per invocation — the pol
counterpart of measure_cinv_arm.py, recording the preconditioner contest on the
spin-2 system (reference chain: plancklens/qcinv/multigrid.py with opfilt_pp).
Env: M_PRE in {dense, diag, mg}; M_X64=1 for f64; M_LMAX (128); M_EPS (1e-5)."""
import os
import jax
jax.config.update('jax_platforms', 'cpu')
if os.environ.get('M_X64') == '1':
    jax.config.update('jax_enable_x64', True)
import numpy as np, time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import plancklens_tpu
from plancklens_tpu.ops.sht import gl_geometry
from plancklens_tpu.models.cinv import CinvP, make_multigrid_pre_op_p
from plancklens_tpu.utils.cls import camb_clfile

lmax = int(os.environ.get('M_LMAX', '128'))
eps = float(os.environ.get('M_EPS', '1e-5'))
pre = os.environ.get('M_PRE', 'dense')
cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                               'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
geom = gl_geometry(lmax)
omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
sig = (55. / 60. / 180. * np.pi) / np.sqrt(omega)
ninv = (1. / sig ** 2) * (np.abs(np.cos(geom.theta))[:, None] > 0.2)
rng = np.random.RandomState(3)
qmap = rng.standard_normal((1, geom.nrings, geom.nphi)) * sig[None]
umap = rng.standard_normal((1, geom.nrings, geom.nphi)) * sig[None]

t0 = time.time()
Ld = 32 if pre == 'dense' else 0
cinv = CinvP(lmax, geom, cls, np.ones(lmax + 1), ninv, eps_min=eps, iter_max=1500,
             lmax_dense=Ld)
if pre == 'mg':
    cinv.pre_op = make_multigrid_pre_op_p(geom, ninv, np.ones(lmax + 1),
                                          cls['ee'], cls['bb'], lmax,
                                          [lmax // 2, lmax // 4], [4, 4], lmax_dense=16)
t_build = time.time() - t0
t0 = time.time()
x, it, rel = cinv.solve_wf(qmap, umap)
print('P%d pre=%-5s x64=%s: iters=%d rel=%.3e build=%.1fs solve=%.1fs'
      % (lmax, pre, os.environ.get('M_X64', '0'), int(np.asarray(it)),
         float(np.asarray(rel).max()), t_build, time.time() - t0), flush=True)
