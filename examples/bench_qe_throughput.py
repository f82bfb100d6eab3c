"""ptt QE step throughput on the real TPU (run from the repo root).

Uses the eager composition — each SHT op is internally jitted with the recursion
tables passed as device arguments. (An outer jit over the whole step embeds the
tables as constants, which works on-chip but exceeds the axon relay's compile
request-size limit above lmax ~512; see __graft_entry__ for the small-lmax
outer-jit path.)

Timing is validated two ways: block_until_ready on the final output, and a full
host readback (np.asarray of the qlm mean) which cannot complete before the chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build_step
from plancklens_tpu.ops.sht import SHT, gl_geometry
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
    # reference point: one spin-1 synthesis on the same product grid
    geom = gl_geometry((2 * lmax + lmax) // 2)
    sht = SHT(geom, lmax, dtype=np.float32)
    g1, c1 = sht.alm2map_spin((tlms[0], jnp.zeros_like(tlms[0])), 1)
    g1.block_until_ready()
    t0 = time.time()
    g1, c1 = sht.alm2map_spin((tlms[1], jnp.zeros_like(tlms[1])), 1)
    g1.block_until_ready()
    t_sht = time.time() - t0
    print("  [ref] one alm2map_spin on product grid: %.1f ms" % (t_sht * 1e3))

    qlm, cl = step(tlms[0])
    qlm.block_until_ready()
    t0 = time.time()
    for i in range(nrep):
        qlm, cl = step(tlms[1 + i])
        qlm.block_until_ready()
    dt_block = (time.time() - t0) / nrep
    t0 = time.time()
    acc = 0.
    for i in range(nrep):
        qlm, cl = step(tlms[1 + i])
        acc += float(np.asarray(jnp.mean(jnp.abs(cl))))
    dt_fetch = (time.time() - t0) / nrep
    assert np.isfinite(acc) and acc != 0., acc
    dt = max(dt_block, dt_fetch)
    per_sim = dt / batch
    print("ptt QE step lmax=%d batch=%d: %.1f ms/step (block) %.1f ms/step (fetch), "
          "%.1f ms/sim, %.0f sims/hour"
          % (lmax, batch, dt_block * 1e3, dt_fetch * 1e3, per_sim * 1e3, 3600. / per_sim),
          flush=True)
