"""True on-chip SHT cost through the relay, by the k-chain slope method.

The relay times upload+compute for fresh numpy-input programs, and returns early for
device-resident ones — so single-program timings are upload-dominated and on-chip time
was previously 'unmeasurable'.  This probe jits ONE program that runs k synthesis+analysis
roundtrips in a lax.scan (each iteration consumes the previous output, so nothing can be
hoisted or CSE'd; the GL-grid roundtrip is exact so values stay bounded).  Input size is
independent of k, hence T(k) = upload + k * t_roundtrip, and the slope isolates the
on-chip roundtrip cost.

Env: S_LMAX, S_BATCH, S_SPIN (0 or 2), S_KS (csv), S_MXU, S_REPS.
"""
import os
import sys
import time
from functools import partial

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

LMAX = int(os.environ.get('S_LMAX', '2048'))
BATCH = int(os.environ.get('S_BATCH', '4'))
SPIN = int(os.environ.get('S_SPIN', '2'))
KS = [int(s) for s in os.environ.get('S_KS', '0,1,4').split(',')]
REPS = int(os.environ.get('S_REPS', '6'))
if os.environ.get('S_MXU'):
    os.environ['PLK_SHT_MXU'] = os.environ['S_MXU']
    os.environ['PLK_SHT_NS'] = '0'   # the plain scan carries the MXU option

import jax
import jax.numpy as jnp
from jax import lax

from plancklens_tpu.ops.sht import SHT
from plancklens_tpu.utils import alm as ualm

sht = SHT(LMAX, dtype=np.float32)
sz = ualm.getsize(LMAX)
rng = np.random.RandomState(0)
glm0 = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
    .astype(np.complex64) * 1e-3


@partial(jax.jit, static_argnums=(1,))
def chain(glm, k):
    """Returns a SCALAR: the relay does not block on compute, so only a value readback
    (np.asarray of the output) actually awaits execution."""
    if SPIN == 0:
        def body(g, _):
            m = sht.alm2map(g)
            return sht.map2alm(m), 0.
        g, _ = lax.scan(body, glm, None, length=k)
        return jnp.sum(jnp.abs(g) ** 2)
    clm = jnp.zeros_like(glm)

    def body(carry, _):
        g, c = carry
        q, u = sht.alm2map_spin((g, c), SPIN)
        return sht.map2alm_spin((q, u), SPIN), 0.
    (g, c), _ = lax.scan(body, (glm, clm), None, length=k)
    return jnp.sum(jnp.abs(g) ** 2)

print('device:', jax.devices()[0], 'lmax', LMAX, 'batch', BATCH, 'spin', SPIN,
      'mxu', os.environ.get('PLK_SHT_MXU', '0'), flush=True)
res = {}
for k in KS:
    out = float(np.asarray(chain(glm0, k)))   # compile + warm + force
    best = np.inf
    for i in range(REPS):
        t0 = time.time()
        v = float(np.asarray(chain(glm0, k)))
        best = min(best, time.time() - t0)
        if i % 3 == 2:
            time.sleep(0.3)
    res[k] = best
    print('k=%d  T=%.1f ms' % (k, best * 1e3), flush=True)

ks = sorted(res)
if len(ks) >= 2:
    slope = (res[ks[-1]] - res[ks[0]]) / (ks[-1] - ks[0])
    print('ONCHIP roundtrip: %.2f ms/batch  %.2f ms/map  (lmax %d batch %d spin %d)'
          % (slope * 1e3, slope * 1e3 / BATCH, LMAX, BATCH, SPIN), flush=True)
    # consistency: middle points vs the line
    for k in ks[1:-1]:
        pred = res[ks[0]] + slope * (k - ks[0])
        print('  k=%d resid vs line: %+.1f ms' % (k, (res[k] - pred) * 1e3), flush=True)
