"""Per-op cost of the ptt QE step on the real TPU (run from the repo root).

On this relay-tunnelled device, block_until_ready timings of eagerly CHAINED jitted ops
are unreliable (a whole chain can report less time than one of its ops), and outputs of
large programs cannot be read back. So the step cost is estimated the only trustworthy
way available: each constituent jitted op is timed alone, fresh, min-over-reps, and the
step cost is the sum. On production TPU (no relay) the whole step jits end-to-end and
XLA fuses across ops, so the sum is an upper bound.
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

from plancklens_tpu.ops.sht import SHT, gl_geometry
from plancklens_tpu.utils import alm as ualm

print("devices:", jax.devices())

NREP = 4


def tmin(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = np.inf
    for _ in range(NREP):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = min(best, time.time() - t0)
    return best


for lmax, batch in ((1024, 8), (2048, 4)):
    rng = np.random.RandomState(0)
    sz = ualm.getsize(lmax)
    # host numpy input: device-resident inputs make the relay's block_until_ready return
    # before execution (impossibly fast timings); the synchronous upload+execute path is
    # the only one that measures real work here
    tlm = (rng.standard_normal((batch, sz))
           + 1j * rng.standard_normal((batch, sz))).astype(np.complex64)
    geom = gl_geometry((2 * lmax + lmax) // 2)
    sht = SHT(geom, lmax, dtype=np.float32)
    sht_out = SHT(geom, lmax, dtype=np.float32)
    zero = np.zeros_like(tlm)
    fl = np.ones(lmax + 1, dtype=np.float32)

    t_fl = tmin(lambda a: ualm.almxfl(a, lmax, fl), tlm)
    t_a2m = tmin(sht.alm2map, tlm)
    t_spin = tmin(lambda a: sht.alm2map_spin((a, zero), 1), tlm)
    tmap = sht.alm2map(tlm)
    g1, c1 = sht.alm2map_spin((tlm, zero), 1)
    m1 = np.full(g1.shape, 0.1, dtype=np.float32)  # host-resident product maps
    t_anal = tmin(lambda a, b: sht_out.map2alm_spin((a, b), 1), m1, m1)

    # step = 2 almxfl-in + alm2map + alm2map_spin + product + map2alm_spin + almxfl-out
    total = 2 * t_fl + t_a2m + t_spin + t_anal + t_fl
    per_sim = total / batch
    print("ptt QE step lmax=%d batch=%d (sum of ops): %.1f ms/step, %.2f ms/sim, "
          "%.0f sims/hour  [almxfl %.2f | alm2map %.1f | alm2map_spin %.1f | "
          "map2alm_spin %.1f ms]"
          % (lmax, batch, total * 1e3, per_sim * 1e3, 3600. / per_sim,
             t_fl * 1e3, t_a2m * 1e3, t_spin * 1e3, t_anal * 1e3), flush=True)
