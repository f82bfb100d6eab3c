#!/usr/bin/env python
"""Benchmark driver: one JSON line with the headline metric on the real TPU.

Headline: batched spin-2 SHT synthesis at lmax = 2048 (the reference pipeline's unit of
cost — every QE costs ~5 SHTs, every CG iteration 2; reference: plancklens/shts.py).
Baseline: healpy map2alm_spin/alm2map_spin at nside 2048, lmax 2048 on a NERSC-class CPU
node takes ~2000 ms single-threaded (healpy is unavailable in this container to measure;
the figure is the standard libsharp-era timing for this size, cf. BASELINE.md "baselines
to measure"). vs_baseline is the speedup factor over that number.
"""
import json
import time

import numpy as np
import jax

LMAX = 2048
BATCH = 4
BASELINE_MS_PER_MAP = 2000.0  # healpy-class CPU spin-2 transform at lmax 2048 (see above)


def main():
    from plancklens_tpu.ops.sht import SHT
    from plancklens_tpu.utils import alm as ualm

    sht = SHT(LMAX, dtype=np.float32)
    rng = np.random.RandomState(0)
    sz = ualm.getsize(LMAX)
    glm = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
        .astype(np.complex64)
    clm = np.zeros_like(glm)

    # compile + warmup
    q, u = sht.alm2map_spin((glm, clm), 2)
    q.block_until_ready()
    # per-rep minimum: robust against interference on a shared device/relay; reps are
    # spread over a few seconds to catch a quiet window
    nit = 12
    best = np.inf
    for i in range(nit):
        t0 = time.time()
        q, u = sht.alm2map_spin((glm, clm), 2)
        q.block_until_ready()
        best = min(best, time.time() - t0)
        if i % 4 == 3:
            time.sleep(0.5)
    dt_ms = best / BATCH * 1e3

    print(json.dumps({
        'metric': 'spin2_alm2map_ms_per_map_lmax2048_batch%d' % BATCH,
        'value': round(dt_ms, 2),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_MS_PER_MAP / dt_ms, 2),
    }))


if __name__ == '__main__':
    main()
