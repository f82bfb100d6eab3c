"""Attempted isolation of on-device Legendre compute from relay transfer — and the
negative result (run from repo root).

Probe: one jitted host-input program iterating synthesis+analysis K times internally
(tables as explicit args; embedded constants exceed the relay compile cap), so the
slope wall(K2)-wall(K1) / (K2-K1) would be pure on-device compute.

Findings on this environment's relay (kept here as the measurement record):
  * wall(K=1) == wall(K=5) == ~130 ms: block_until_ready returns after upload,
    NOT after execution;
  * fetching even the program's tiny (batch,) float32 output raises UNIMPLEMENTED.
So on-device execution can be neither awaited nor observed through the relay: every
quotable number (bench.py) is host-transfer + dispatch, a strict UPPER bound on what
any on-chip caller would pay, and on-device throughput is strictly better. Numerics are
validated on the CPU backend (same code, f64).
"""

# runnable from a source checkout without installation
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from plancklens_tpu.ops.sht import core, gl_geometry
from plancklens_tpu.utils import alm as ualm

print("devices:", jax.devices())

LMAX, BATCH = 2048, 4
geom = gl_geometry(LMAX)
t = core.recursion_tables(LMAX, LMAX, -2, geom.theta, grid_token=geom.token(),
                          dtype=np.float32)
tb = t['np']
S = t['S']


@partial(jax.jit, static_argnums=(0,))
def kloop(K, C, alpha, beta, gamma, l0, seed_v, seed_k, x, w):
    def body(i, c):
        F = core._legendre_scan('synth', S, c, alpha, beta, gamma, l0, seed_v, seed_k, x)
        return core._legendre_scan('anal', S, F * w, alpha, beta, gamma, l0,
                                   seed_v, seed_k, x) * (1. / (4. * np.pi))
    out = jax.lax.fori_loop(0, K, body, C)
    return jnp.sum(jnp.abs(out) ** 2, axis=(1, 2))  # tiny output


rng = np.random.RandomState(0)
C = (rng.standard_normal((BATCH, LMAX + 1, LMAX + 1))
     + 1j * rng.standard_normal((BATCH, LMAX + 1, LMAX + 1))).astype(np.complex64) * 1e-3
w = geom.weight[:, None].astype(np.float32)
args = (tb['alpha'].astype(np.float32), tb['beta'].astype(np.float32),
        tb['gamma'].astype(np.float32), tb['l0'], tb['seed_v'].astype(np.float32),
        tb['seed_k'], tb['x'].astype(np.float32), w)

walls = {}
for K in (1, 5):
    out = kloop(K, C, *args)
    out.block_until_ready()   # post-upload barrier only; value fetch raises UNIMPLEMENTED
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        out = kloop(K, C, *args)
        out.block_until_ready()
        best = min(best, time.time() - t0)
    walls[K] = best
    print("K=%d: %.1f ms (min of 4)" % (K, best * 1e3), flush=True)

per_iter = (walls[5] - walls[1]) / 4.
print("wall slope per synth+anal iteration: %.2f ms (zero => block is upload-only "
      "and on-device time is unobservable here; see module docstring)"
      % (per_iter * 1e3))
