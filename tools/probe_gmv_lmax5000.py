"""BASELINE config #5 stretch probe: GMV reconstruction at lmax 5000.

Compile-only XLA cost analysis of the fused GMV ('p' MV key, joint-TP filtered
T/E/B inputs) quadratic-estimator step at lmax_ivf = lmax_qlm = 5000 in f32 — the
SO/CMB-S4-scale configuration of BASELINE.json. The joint 3x3 filter itself is
almxfl-level (negligible); the cost is the compressed QE legs' SHTs on the GL grid
exact for the triple product. Prints the cost-model per-map bound against v5e HBM/
VPU numbers and the 500-sim batch projection, plus the ('sims','m') mesh sharding
arithmetic for an 8-device slice.

Runs on the CPU backend (no relay dependency); results recorded in docs/PERF.md.
"""
import os
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax.numpy as jnp
import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cl_inverse, alm as ualm
from plancklens_tpu.models.qest import eval_qe
from plancklens_tpu.ops.sht import gl_geometry

LMAX = int(os.environ.get('M_LMAX', '5000'))
BATCH = int(os.environ.get('M_BATCH', '2'))
HBM_GBPS = 819e9   # v5e; v5p is 2765e9
PEAK_F32 = 2e12

cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
cls_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)
nt2 = (1.0 / 60. / 180. * np.pi) ** 2   # S4-ish depths
np2 = 2. * nt2
cls_dat = {'tt': cls_len['tt'] + nt2, 'ee': cls_len['ee'] + np2,
           'bb': cls_len['bb'] + np2, 'te': np.copy(cls_len['te'])}
fal = cl_inverse(cls_dat)
for cl in fal.values():
    cl[:30] = 0.
ftt = np.nan_to_num(fal['tt']).astype(np.float32)
fee = np.nan_to_num(fal['ee']).astype(np.float32)
fbb = np.nan_to_num(fal['bb']).astype(np.float32)
geom = gl_geometry((2 * LMAX + LMAX) // 2)


def step(tlm, elm, blm):
    """Joint-TP filter (diagonal part; the 3x3 mixing is the same almxfl cost) +
    fused GMV 'p' QE at lmax_qlm = LMAX."""
    bar = {'t': ualm.almxfl(tlm, LMAX, ftt),
           'e': ualm.almxfl(elm, LMAX, fee),
           'b': ualm.almxfl(blm, LMAX, fbb)}
    return eval_qe('p', LMAX, cls_len, lambda f: bar[f], LMAX, geom=geom,
                   dtype=np.float32)


sz = ualm.getsize(LMAX)
args = tuple(jnp.zeros((BATCH, sz), dtype=np.complex64) for _ in range(3))
t0 = time.time()
lowered = jax.jit(step).lower(*args)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
fl = ca.get('flops', 0.)
by = ca.get('bytes accessed', 0.)
ms = max(by / HBM_GBPS, fl / PEAK_F32) * 1e3
print('GMV p lmax=%d batch=%d: compile %.1fs  flops %.3e  bytes %.3e' %
      (LMAX, BATCH, time.time() - t0, fl, by))
print('  per-map cost-model bound: %.1f ms (v5e HBM %.0f GB/s)  '
      '%.1f ms on v5p (2765 GB/s)' % (ms / BATCH, HBM_GBPS / 1e9,
                                      max(by / 2765e9, fl / PEAK_F32) * 1e3 / BATCH))
print('  500-sim batch projection: %.1f s (v5e)  %.2f s (v5p-8, DP over sims)'
      % (ms / BATCH * 500 / 1e3, max(by / 2765e9, fl / PEAK_F32) * 1e3
         / BATCH * 500 / 1e3 / 8))
# ('sims','m') sharding arithmetic for one 8-device slice
maps_b = geom.nrings * geom.nphi * 4
alms_b = sz * 8
print('  per-device working set at batch 8, mesh (sims=2, m=4): map %.2f GB, '
      'alm %.2f GB, tables %.2f GB' %
      (8 / 2 * maps_b / 4 / 1e9, 8 / 2 * alms_b / 4 / 1e9,
       3 * (LMAX + 1) ** 2 * 4 / 4 / 1e9))
