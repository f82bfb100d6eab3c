"""A/B the MXU-shaped accumulate path vs the sequential multiply-add path on CPU at
production-like batch (flop-count identical; measures the GEMM reshaping's effect)."""
import os
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
import sys, time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

BATCH = int(os.environ.get('AB_BATCH', '32'))
LMAX = int(os.environ.get('AB_LMAX', '256'))

os.environ['PLK_SHT_NS'] = '0'   # the plain scan carries the option
from plancklens_tpu.ops.sht.core import legendre_synth, legendre_anal

theta = np.polynomial.legendre.leggauss(LMAX + 1)[0]
theta = np.arccos(theta[::-1])
rng = np.random.RandomState(0)
C = (rng.standard_normal((BATCH, LMAX + 1, LMAX + 1))
     + 1j * rng.standard_normal((BATCH, LMAX + 1, LMAX + 1))).astype(np.complex64)
C *= (np.arange(LMAX + 1)[None, None, :] <= np.arange(LMAX + 1)[None, :, None])


def timed(tag):
    F = legendre_synth(jnp.asarray(C), 0, theta, grid_token='ab', dtype=np.float32)
    F.block_until_ready()
    best_s = 1e30
    for _ in range(3):
        t0 = time.time()
        legendre_synth(jnp.asarray(C), 0, theta, grid_token='ab',
                       dtype=np.float32).block_until_ready()
        best_s = min(best_s, time.time() - t0)
    A = legendre_anal(jnp.asarray(np.asarray(F)), 0, theta, LMAX, grid_token='ab',
                      dtype=np.float32)
    A.block_until_ready()
    best_a = 1e30
    for _ in range(3):
        t0 = time.time()
        legendre_anal(jnp.asarray(np.asarray(F)), 0, theta, LMAX, grid_token='ab',
                      dtype=np.float32).block_until_ready()
        best_a = min(best_a, time.time() - t0)
    print('AB %s batch=%d lmax=%d: synth %.2f s  anal %.2f s'
          % (tag, BATCH, LMAX, best_s, best_a), flush=True)
    return np.asarray(F)


os.environ['PLK_SHT_MXU'] = '0'
F0 = timed('seq')
os.environ['PLK_SHT_MXU'] = '1'
F1 = timed('mxu')
print('max rel diff:', np.abs(F1 - F0).max() / np.abs(F0).max())
