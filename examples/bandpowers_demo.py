"""Debiased lensing band-powers over the masked self-contained pipeline.

The role of the reference's bandpowers assembly over a parameter file (reference:
plancklens/bandpowers.py:43-360 consuming params/*): lensed masked sims -> CG filtering
-> QE spectra with dd/ds/ss legs -> RDN0 / MCN0 / N1 debiasing -> binned band-powers.

Shrunk by default so it runs on a single CPU core in a few minutes:
    python examples/bandpowers_demo.py            # lmax 32, 5 sims
    PLK_ANISO_LMAX=2048 PLK_ANISO_NSIMS=300 ...   # the Planck-like configuration

At the shrunk size the band-powers are reconstruction-noise dominated and very noisy
(lmax 32, 5 sims); the RDN0 == MCN0 == analytic-N0 consistency of the debiasers is
tested at meaningful size in tests/test_bandpowers.py.
"""

# runnable from a source checkout without installation
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
import os
import sys
import time

os.environ.setdefault('PLK_ANISO_LMAX', '32')
os.environ.setdefault('PLK_ANISO_NSIMS', '5')

import jax
if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import importlib.util

t0 = time.time()
spec = importlib.util.spec_from_file_location(
    'aniso', os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          'params', 'anisofilt_example.py'))
par = importlib.util.module_from_spec(spec)
spec.loader.exec_module(par)
print('[%6.1fs] parfile loaded: lmax=%d nsims=%d fsky=%.3f'
      % (time.time() - t0, par.lmax_ivf, par.nsims, par.mask.mean()), flush=True)

from plancklens_tpu.models.bandpowers import Binner

lmax = par.lmax_qlm
btype = '%d_%d_%d' % (max(2, lmax // 8), lmax // 2, lmax)
binner = Binner('ptt', 'ptt', par, btype, lmaxphi=lmax)
print('[%6.1fs] binner ready, bins %s' % (time.time() - t0, btype), flush=True)

dat = np.asarray(binner.get_dat_bandpowers())
print('[%6.1fs] data band-powers      %s' % (time.time() - t0, dat), flush=True)
mcn0 = np.asarray(binner.get_mcn0())
print('[%6.1fs] MCN0                  %s' % (time.time() - t0, mcn0), flush=True)
rdn0 = np.asarray(binner.get_rdn0())
print('[%6.1fs] RDN0                  %s' % (time.time() - t0, rdn0), flush=True)
n1 = np.asarray(binner.get_n1())
print('[%6.1fs] N1                    %s' % (time.time() - t0, n1), flush=True)
bp = dat - rdn0 - n1
print('[%6.1fs] debiased band-powers  %s' % (time.time() - t0, bp), flush=True)
print('fiducial C_L^kk bins        %s' % np.asarray(binner.fid_bandpowers))
