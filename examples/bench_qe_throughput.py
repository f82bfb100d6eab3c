"""ptt QE step throughput on the real TPU (run from the repo root).

Uses the eager composition — each SHT op is internally jitted with the recursion
tables passed as device arguments. (An outer jit over the whole step embeds the
tables as constants, which works on-chip but exceeds the axon relay's compile
request-size limit above lmax ~512; see __graft_entry__ for the small-lmax
outer-jit path.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_step
from plancklens_tpu.utils import alm as ualm

print("devices:", jax.devices())

for lmax, batch in ((1024, 8), (2048, 4)):
    step = _build_step(lmax, lmax)
    rng = np.random.RandomState(0)
    sz = ualm.getsize(lmax)
    nrep = 5
    # distinct input per rep: identical dispatches can be served from caches upstream
    tlms = [jnp.asarray((rng.standard_normal((batch, sz))
                         + 1j * rng.standard_normal((batch, sz))).astype(np.complex64))
            for _ in range(nrep + 1)]
    for t in tlms:
        t.block_until_ready()
    qlm, cl = step(tlms[0])
    qlm.block_until_ready()
    t0 = time.time()
    for i in range(nrep):
        qlm, cl = step(tlms[1 + i])
        qlm.block_until_ready()
    dt = (time.time() - t0) / nrep
    per_sim = dt / batch
    print("ptt QE step lmax=%d batch=%d: %.1f ms/step, %.1f ms/sim, %.0f sims/hour"
          % (lmax, batch, dt * 1e3, per_sim * 1e3, 3600. / per_sim), flush=True)
