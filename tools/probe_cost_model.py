"""XLA TPU cost-model numbers for the SHT programs (no execution: AOT compile +
cost_analysis). The relay cannot time on-chip compute (see onchip_slope.py finding:
k-chained programs time flat in k, and device->host readback is UNIMPLEMENTED), so the
compiler's own cost model is the only hardware-grounded statement available here."""
import os
import sys
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
LMAX = int(os.environ.get('C_LMAX', '2048'))
BATCH = int(os.environ.get('C_BATCH', '4'))

import jax
import jax.numpy as jnp

from plancklens_tpu.ops.sht import SHT
from plancklens_tpu.utils import alm as ualm


def analyze(tag):
    sht = SHT(LMAX, dtype=np.float32)
    sz = ualm.getsize(LMAX)
    glm = jnp.zeros((BATCH, sz), dtype=np.complex64)

    def synth(g):
        q, u = sht.alm2map_spin((g, jnp.zeros_like(g)), 2)
        return q, u

    lowered = jax.jit(synth).lower(glm)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', float('nan'))
    ba = ca.get('bytes accessed', float('nan'))
    print('%s: flops=%.3e  bytes=%.3e  arith.intensity=%.1f flops/byte'
          % (tag, flops, ba, flops / ba if ba else float('nan')), flush=True)
    # v5e lite peak: ~394 TFLOP/s bf16 MXU, ~ a few TFLOP/s f32 VPU; HBM ~819 GB/s
    print('  time bounds: %.2f ms (HBM-bound, 819 GB/s)  %.2f ms (VPU 2 TF/s)  '
          '%.2f ms (MXU f32 ~98 TF/s)'
          % (ba / 819e9 * 1e3, flops / 2e12 * 1e3, flops / 98e12 * 1e3), flush=True)
    return ca


print('device:', jax.devices()[0], 'lmax', LMAX, 'batch', BATCH, flush=True)
os.environ['PLK_SHT_NS'] = '1'
os.environ.pop('PLK_SHT_MXU', None)
analyze('NS-pair scan (default)')
os.environ['PLK_SHT_NS'] = '0'
os.environ['PLK_SHT_MXU'] = '1'
analyze('plain scan + MXU accumulate')
os.environ['PLK_SHT_MXU'] = '0'
analyze('plain scan (VPU accumulate)')
