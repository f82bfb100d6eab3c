#!/usr/bin/env python
"""Benchmark driver: ONE JSON line with the headline metric + all four BASELINE.json
metrics (spin-2 SHT ms @ lmax 2048; cinv CG sec to 1e-5; QE alms/sec; sims/hour).

Structure (round 5: every arm lands, baselines are MEASURED):
  - the parent is a watchdog that never touches the jax backend; it spawns TWO children
    IN PARALLEL and merges their JSON streams:
      * TPU child: wall timings over the relay (spin-2 synth/anal, per-CG-iteration at
        192/1024, QE stage walls, the Pallas-engine dispatch wall) + the Pallas kernels'
        compiled cost model (AOT, abstract shapes — no upload);
      * CPU child: backend-portable XLA cost-model arms (spin-2 pair, cinv fwd T+P, the
        fused ptt QE step), the composed north-star bound, and the MEASURED baseline
        denominators (this engine on one CPU core: spin-2 synthesis probe, a live masked
        cinv solve to 1e-5, a ptt QE step probe).
  - the JSON line is emitted incrementally after every arm (a kill leaves the last
    printed line parseable); the parent's final print is the merged, complete line.

Baseline honesty: `vs_baseline` divides by the MEASURED same-host CPU denominator
(single core, this engine, lmax-1024 probe scaled by the engine's verified ~lmax^3 work
scaling); the healpy/libsharp-era literature figure (~2000 ms/map) is kept as an extra
for context only.

Relay caveats (docs/PERF.md k-chain probe): the relay completes compute asynchronously
and block_until_ready returns after input upload — every TPU wall number is
host->device transfer + dispatch; the onchip_* entries are the hardware-grounded
cost-model statements.
"""
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

LMAX = 2048
BATCH = 4
T0 = time.time()
DEADLINE = float(os.environ.get('PLK_BENCH_DEADLINE', '480'))
SUBPROC_CAP = 240  # hard cap on every measuring subprocess, seconds

# Iteration counts of the bench cinv system (galactic cut |cos th|>0.2, 35 uK-arcmin,
# GL grid, PCG to rel resid 1e-5, analytic dense-64 + diag split at 192; diag at
# 512/1024). Measured by actual solves (docs/PERF.md, re-measured live by the CPU
# child's cinv_baseline arm each run):
RECORDED_ITERS = {
    'lmax192_dense64': {'f32': 589, 'f64': 572},
    'lmax512_diag': {'f32': 246, 'f64': 263},
    'lmax1024_diag': {'f32': 160},
}

HBM_GBPS = 819e9   # v5e HBM bandwidth for the cost-model bound
PEAK_F32 = 2e12    # VPU-class f32 throughput bound


def left():
    return DEADLINE - (time.time() - T0)


class Bench:
    def __init__(self):
        self.x = {}        # extras
        self.synth_ms = None
        self.skipped = []
        self._sht2048 = None
        self._sht3072 = None

    # ------------------------------------------------------------------ helpers
    def sht2048(self, engine=None):
        from plancklens_tpu.ops.sht import SHT
        if engine is not None:
            return SHT(LMAX, dtype=np.float32, engine=engine)
        if self._sht2048 is None:
            self._sht2048 = SHT(LMAX, dtype=np.float32, engine='xla')
        return self._sht2048

    def sht3072(self):
        if self._sht3072 is None:
            from plancklens_tpu.ops.sht import SHT, gl_geometry
            geom = gl_geometry((2 * LMAX + LMAX) // 2)
            self._sht3072 = SHT(geom, LMAX, dtype=np.float32, engine='xla')
        return self._sht3072

    @staticmethod
    def _min_time(fn, nit=3):
        best = np.inf
        for i in range(nit):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    @staticmethod
    def _cost(fn, args):
        """(ms_bound, flops, bytes) from XLA's cost analysis of the compiled program."""
        import jax
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        byt = ca.get('bytes accessed', 0.)
        fl = ca.get('flops', 0.)
        return (round(max(byt / HBM_GBPS, fl / PEAK_F32) * 1e3, 2),
                round(fl, -7), round(byt, -7))

    def emit(self, final=False):
        """Print the full JSON line with everything measured so far (flushed)."""
        _compose(self.x)
        self.x['elapsed_s'] = round(time.time() - T0, 1)
        if self.skipped:
            self.x['skipped_arms'] = list(self.skipped)
        self.x['complete'] = bool(final)
        print(json.dumps(_headline(self.synth_ms, self.x)), flush=True)

    def run_arm(self, name, est_sec, fn):
        if left() < est_sec:
            self.skipped.append('%s (needs ~%ds, %ds left)' % (name, est_sec, left()))
            return
        try:
            fn()
        except Exception as e:  # an arm failure must not kill the bench
            self.x.setdefault('arm_errors', {})[name] = repr(e)[:300]
        self.emit()

    # ----------------------------------------------------------- TPU wall arms
    def arm_sht_wall(self):
        """Headline: spin-2 synthesis + analysis wall at lmax 2048 (transfer-bound)."""
        from plancklens_tpu.utils import alm as ualm
        sht = self.sht2048()
        rng = np.random.RandomState(0)
        sz = ualm.getsize(LMAX)
        glm = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
            .astype(np.complex64)
        clm = np.zeros_like(glm)
        q, _ = sht.alm2map_spin((glm, clm), 2)   # compile + warmup
        q.block_until_ready()
        self.synth_ms = self._min_time(
            lambda: sht.alm2map_spin((glm, clm), 2)[0].block_until_ready(),
            nit=3) / BATCH * 1e3
        q_np = np.asarray(rng.standard_normal(q.shape), dtype=np.float32)
        u_np = np.asarray(rng.standard_normal(q.shape), dtype=np.float32)
        e, _ = sht.map2alm_spin((q_np, u_np), 2)
        e.block_until_ready()
        anal_ms = self._min_time(
            lambda: sht.map2alm_spin((q_np, u_np), 2)[0].block_until_ready(),
            nit=2) / BATCH * 1e3
        self.x['spin2_synth_wall_ms_per_map'] = round(self.synth_ms, 2)
        self.x['spin2_map2alm_ms_per_map'] = round(anal_ms, 2)
        self.x['timing_scope'] = (
            'host->device upload + async dispatch; the relay completes compute '
            'asynchronously and cannot be awaited (docs/PERF.md k-chain probe); the '
            'onchip_* entries are the XLA cost-model statements')

    def arm_sht_wall_pallas(self):
        """Dispatch wall of the PRODUCTION (Pallas fused NS-pair) engine at lmax 2048.
        Values are never read back (the relay cannot transfer Pallas outputs to host);
        block_until_ready bounds the upload+dispatch wall exactly as for the XLA arm."""
        from plancklens_tpu.utils import alm as ualm
        sht = self.sht2048(engine='pallas')
        rng = np.random.RandomState(1)
        sz = ualm.getsize(LMAX)
        glm = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
            .astype(np.complex64)
        clm = np.zeros_like(glm)
        q, _ = sht.alm2map_spin((glm, clm), 2)
        q.block_until_ready()
        self.x['spin2_synth_wall_ms_per_map_pallas'] = round(self._min_time(
            lambda: sht.alm2map_spin((glm, clm), 2)[0].block_until_ready(),
            nit=2) / BATCH * 1e3, 2)
        q_np = np.asarray(rng.standard_normal((BATCH, sht.geom.nrings, sht.geom.nphi)),
                          dtype=np.float32)
        e, _ = sht.map2alm_spin((q_np, q_np), 2)
        e.block_until_ready()
        self.x['spin2_anal_wall_ms_per_map_pallas'] = round(self._min_time(
            lambda: sht.map2alm_spin((q_np, q_np), 2)[0].block_until_ready(),
            nit=2) / BATCH * 1e3, 2)

    def arm_cost_sht_pallas(self):
        """On-chip statement for the production Pallas path at lmax 2048: Mosaic-compiled
        (AOT, abstract shapes) XLA cost analysis + the kernels' analytic VMEM-resident
        traffic (the pl.CostEstimate totals)."""
        import jax
        from plancklens_tpu.ops.sht import pallas_kernel as pk
        B2 = 2 * BATCH                      # complex parts folded into the batch
        nh = (LMAX + 1 + 1) // 2
        M = LMAX + 1
        tiles = pk._pair_tiles()
        sd = jax.ShapeDtypeStruct
        tabs = sd((LMAX + 1, M), np.float32)
        l0 = sd((M,), np.int32)
        sv, sk = sd((nh, M), np.float32), sd((nh, M), np.int32)
        x = sd((nh,), np.float32)
        C = sd((LMAX + 1, B2, M), np.float32)
        comp = jax.jit(pk._synth_pair_pallas, static_argnums=(0, 1, 2, 3)).lower(
            64, False, tiles, False, tabs, tabs, tabs, tabs, tabs, tabs, l0, l0,
            sv, sk, sv, sk, x, C, C).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fl, byt = ca.get('flops', 0.), ca.get('bytes accessed', 0.)
        self.x['onchip_spin2_synth_ms_per_map_pallas'] = round(
            max(byt / HBM_GBPS, fl / PEAK_F32) * 1e3 / BATCH, 2)
        self.x['onchip_spin2_synth_flops_pallas'] = round(fl, -7)
        self.x['onchip_spin2_synth_bytes_pallas'] = round(byt, -7)
        afl, abyt = pk.synth_pair_cost(LMAX + 1, B2, M, nh, False, tiles)
        self.x['pallas_synth_kernel_bytes_analytic'] = abyt
        Q = sd((B2, nh, M), np.float32)
        comp = jax.jit(pk._anal_pair_pallas, static_argnums=(0, 1, 2, 3, 4)).lower(
            64, LMAX + 1, False, tiles, False, tabs, tabs, tabs, tabs, tabs, tabs,
            l0, l0, sv, sk, sv, sk, x, Q, Q, Q, Q).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fl, byt = ca.get('flops', 0.), ca.get('bytes accessed', 0.)
        self.x['onchip_spin2_anal_ms_per_map_pallas'] = round(
            max(byt / HBM_GBPS, fl / PEAK_F32) * 1e3 / BATCH, 2)
        self.x['onchip_spin2_anal_flops_pallas'] = round(fl, -7)
        self.x['onchip_spin2_anal_bytes_pallas'] = round(byt, -7)
        afl, abyt = pk.anal_pair_cost(LMAX + 1, B2, M, nh, False, tiles)
        self.x['pallas_anal_kernel_bytes_analytic'] = abyt
        self.x['pallas_note'] = (
            'production TPU engine (PLK_SHT_ENGINE default on TPU backends): fused '
            'NS-pair VMEM-resident kernels; *_bytes_pallas is the compiled program '
            '(incl. padding copies), *_kernel_bytes_analytic the kernel-level HBM '
            'traffic; XLA scan engine streamed 16.6/37.2 GB for the same batch-4 '
            'transforms (BENCH_r04)')

    def arm_periter(self, lmax, est_key):
        """TPU wall of one CG iteration (spin-0 synthesis + analysis) at `lmax`."""
        from plancklens_tpu.ops.sht import SHT, gl_geometry
        from plancklens_tpu.utils import alm as ualm
        geom = gl_geometry(lmax)
        sht = SHT(geom, lmax, dtype=np.float32, engine='xla')
        rng = np.random.RandomState(3)
        sz = ualm.getsize(lmax)
        alm = (rng.standard_normal((BATCH, sz)) + 1j * rng.standard_normal((BATCH, sz))) \
            .astype(np.complex64)
        m = sht.alm2map(alm)
        m.block_until_ready()
        t_synth = self._min_time(lambda: sht.alm2map(alm).block_until_ready(), nit=2)
        m_np = np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                          dtype=np.float32)
        a2 = sht.map2alm(m_np)
        a2.block_until_ready()
        t_anal = self._min_time(lambda: sht.map2alm(m_np).block_until_ready(), nit=2)
        self.x.setdefault('cinv_tpu_ms_per_iter', {})[est_key] = \
            round((t_synth + t_anal) / BATCH * 1e3, 2)

    def arm_qe_wall(self):
        """Metric 3 wall: 'ptt' QE cost as the sum of its individually-timed stage
        programs (the relay rejects the whole step as one jit program and under-reports
        eagerly-chained timings)."""
        import jax.numpy as jnp
        from plancklens_tpu.utils import alm as ualm
        sht = self.sht3072()
        geom = sht.geom
        rng = np.random.RandomState(2)
        sz = ualm.getsize(LMAX)
        tlm = jnp.asarray((rng.standard_normal((BATCH, sz))
                           + 1j * rng.standard_normal((BATCH, sz))).astype(np.complex64))
        zl = jnp.zeros_like(tlm)
        tmap = sht.alm2map(tlm)
        tmap.block_until_ready()
        t0 = self._min_time(lambda: sht.alm2map(tlm).block_until_ready(), nit=2)
        g1, _ = sht.alm2map_spin((tlm, zl), 1)
        g1.block_until_ready()
        t1 = self._min_time(lambda: sht.alm2map_spin((tlm, zl), 1)[0].block_until_ready(),
                            nit=2)
        prod = (np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                           dtype=np.float32),
                np.asarray(rng.standard_normal((BATCH, geom.nrings, geom.nphi)),
                           dtype=np.float32))
        e, _ = sht.map2alm_spin(prod, 1)
        e.block_until_ready()
        t2 = self._min_time(lambda: sht.map2alm_spin(prod, 1)[0].block_until_ready(),
                            nit=2)
        dt = (t0 + t1 + t2) / BATCH
        self.x['qe_ptt_sec_per_est_lmax2048'] = round(dt, 3)
        self.x['qe_ptt_alms_per_sec_lmax2048'] = round(1. / dt, 3)
        self.x['qe_method'] = 'sum_of_stage_timings (relay rejects the fused program)'

    # ------------------------------------------------------------ CPU cost arms
    def arm_cost_sht(self):
        """On-chip statement for metric 1: cost model of the compiled spin-2 pair."""
        import jax.numpy as jnp
        from plancklens_tpu.utils import alm as ualm
        sht = self.sht2048()
        glm = jnp.zeros((BATCH, ualm.getsize(LMAX)), dtype=np.complex64)
        ms, fl, by = self._cost(
            lambda g: sht.alm2map_spin((g, jnp.zeros_like(g)), 2), (glm,))
        self.x['onchip_spin2_synth_ms_per_map'] = round(ms / BATCH, 2)
        self.x['onchip_spin2_synth_flops'] = fl
        self.x['onchip_spin2_synth_bytes'] = by
        m = jnp.zeros((BATCH, sht.geom.nrings, sht.geom.nphi), dtype=np.float32)
        ms_a, fl_a, by_a = self._cost(lambda q: sht.map2alm_spin((q, q), 2), (m,))
        self.x['onchip_spin2_anal_ms_per_map'] = round(ms_a / BATCH, 2)
        self.x['onchip_spin2_anal_bytes'] = by_a
        self.x['onchip_anal_vs_synth_bytes'] = round(by_a / by, 2) if by else None

    def arm_cost_cinv(self):
        """On-chip statement for metric 2: cost model of one CG forward application at
        lmax 2048 — the T system (spin-0) and the polarisation system (spin-2)."""
        import jax.numpy as jnp
        from plancklens_tpu.utils import alm as ualm
        sht = self.sht2048()
        ninv = np.ones((sht.geom.nrings, sht.geom.nphi), dtype=np.float32)
        sinv = np.ones(LMAX + 1, dtype=np.float32)

        def fwd_t(tlm):
            m = sht.alm2map(tlm) * ninv[None]
            return sht.map2alm(m) + ualm.almxfl(tlm, LMAX, sinv)

        tlm = jnp.zeros((BATCH, ualm.getsize(LMAX)), dtype=np.complex64)
        ms, fl, by = self._cost(fwd_t, (tlm,))
        self.x['onchip_cinv_ms_per_iter_lmax2048'] = round(ms / BATCH, 2)
        self.x['onchip_cinv_iter_flops'] = fl
        self.x['onchip_cinv_iter_bytes'] = by

        def fwd_p(eb):
            q, u = sht.alm2map_spin((eb[:, 0], eb[:, 1]), 2)
            e, b = sht.map2alm_spin((q * ninv[None], u * ninv[None]), 2)
            return jnp.stack([e + ualm.almxfl(eb[:, 0], LMAX, sinv),
                              b + ualm.almxfl(eb[:, 1], LMAX, sinv)], axis=1)

        eb = jnp.zeros((BATCH, 2, ualm.getsize(LMAX)), dtype=np.complex64)
        ms_p, fl_p, by_p = self._cost(fwd_p, (eb,))
        self.x['onchip_cinv_pol_ms_per_iter_lmax2048'] = round(ms_p / BATCH, 2)

    def arm_cost_qe(self):
        """On-chip statement for metric 3: cost model of the FUSED ptt QE step at
        lmax 2048 (filter -> legs -> product -> spin-1 analysis -> normalisation),
        compile-only."""
        import __graft_entry__ as ge
        step = ge._build_step(LMAX, LMAX)
        tlm = np.zeros((BATCH, _alm_size(LMAX)), dtype=np.complex64)
        ms, fl, by = self._cost(step, (tlm,))
        self.x['onchip_qe_ptt_step_ms_lmax2048'] = round(ms / BATCH, 2)
        self.x['onchip_qe_step_flops'] = fl
        self.x['onchip_qe_step_bytes'] = by

    def arm_northstar(self):
        """Composed north-star bound: the smica-style chain per sim at lmax 2048 through
        the XLA cost model — T + P cinv filtering (measured iteration count) + the dd QE
        + the ds/ss RDN0 legs — emitted with per-stage terms, x300 sims
        (BASELINE north star: 300 sims < 1 h)."""
        it = RECORDED_ITERS['lmax1024_diag']['f32']  # iters measured to FALL with lmax
        oc_t = self.x.get('onchip_cinv_ms_per_iter_lmax2048')
        oc_p = self.x.get('onchip_cinv_pol_ms_per_iter_lmax2048')
        oc_qe = self.x.get('onchip_qe_ptt_step_ms_lmax2048')
        if not (oc_t and oc_p and oc_qe):
            raise RuntimeError('cost arms must run first')
        stages = {
            'filt_T_s': oc_t * it / 1e3,
            'filt_P_s': oc_p * it / 1e3,
            'qe_dd_s': oc_qe / 1e3,
            'qe_ds_s': oc_qe / 1e3,     # RDN0 data x sim leg
            'qe_ss_s': oc_qe / 1e3,     # MCN0/RDN0 sim x sim' leg
        }
        per_sim = sum(stages.values())
        self.x['northstar_stage_terms_s'] = {k: round(v, 3) for k, v in stages.items()}
        self.x['northstar_composed_s'] = round(per_sim * 300, 1)
        self.x['northstar_sims_per_hour'] = round(3600. / per_sim, 1)
        self.x['northstar_note'] = (
            'XLA cost-model bound per sim: full T + P cinv solves (%d iters each, '
            'measured) + 3 QE steps (dd + RDN0 ds/ss legs) at lmax 2048; MF QEs reuse '
            'the per-sim products. 300-sim chain bound; qcl/bandpower algebra is '
            'negligible next to these.' % it)

    # ------------------------------------------------------- CPU measured baselines
    def arm_cpu_baselines(self):
        """MEASURED baseline denominators on this host's CPU (one core, this engine):
        spin-2 synthesis, a live masked cinv solve to 1e-5, and a ptt QE step."""
        out = _cpu_probe()
        if out is None:
            raise RuntimeError('cpu probe subprocess failed')
        probe_ms, qe_ms, lmax_probe = out
        scale = (LMAX / lmax_probe) ** 3
        self.x['cpu_spin2_synth_ms_lmax%d_measured' % lmax_probe] = round(probe_ms, 1)
        self.x['cpu_spin2_synth_ms_lmax2048'] = round(probe_ms * scale, 1)
        self.x['cpu_qe_ptt_step_ms_lmax%d_measured' % lmax_probe] = round(qe_ms, 1)
        self.x['cpu_qe_ptt_sec_lmax2048'] = round(qe_ms * scale / 1e3, 2)
        self.x['cpu_baseline_note'] = (
            'this engine, one CPU core of this host, lmax-%d probe scaled by the '
            'engine\'s verified ~lmax^3 work scaling (0.73 s @512 -> 6.7 s @1024 '
            'measured = x9.2 per doubling)' % lmax_probe)
        self.x['cpu_baseline_provenance'] = 'measured live this run'
        _save_baseline_cache({k: self.x[k] for k in _BASELINE_KEYS if k in self.x})

    def arm_cinv_baseline(self):
        """Live masked cinv solve on this host's CPU: measured seconds AND iteration
        count to 1e-5 at lmax 192 (the recorded-iteration sanity anchor)."""
        sec, iters, rel = _cinv_live(192)
        if sec is None:
            raise RuntimeError('cinv live subprocess failed')
        self.x['cinv_cpu_sec_to_1e-5_lmax192_measured'] = round(sec, 1)
        self.x['cinv_iters_lmax192_live'] = {'f32': iters, 'f32_final_rel': rel}
        _save_baseline_cache({k: self.x[k] for k in _BASELINE_KEYS if k in self.x})


# Measured-baseline keys persisted to BENCH_BASELINES.json (committed): one good live
# measurement serves every later run, so a tight external deadline or a loaded host
# can never push `vs_baseline` back onto the literature guess. Live values always win.
_BASELINE_KEYS = (
    'cpu_spin2_synth_ms_lmax1024_measured', 'cpu_spin2_synth_ms_lmax2048',
    'cpu_qe_ptt_step_ms_lmax1024_measured', 'cpu_qe_ptt_sec_lmax2048',
    'cpu_baseline_note', 'cinv_cpu_sec_to_1e-5_lmax192_measured',
    'cinv_iters_lmax192_live',
)


def _baseline_cache_path():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'BENCH_BASELINES.json')


def _load_baseline_cache():
    try:
        with open(_baseline_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_baseline_cache(vals):
    if not vals:
        return
    try:
        import platform
        cur = _load_baseline_cache()
        for k, v in vals.items():
            # timing denominators keep the FASTEST measurement (min = least load
            # noise; a contention-inflated baseline would flatter vs_baseline)
            if (isinstance(v, (int, float)) and isinstance(cur.get(k), (int, float))
                    and ('_ms' in k or '_sec' in k) and cur.get('host') == platform.node()):
                cur[k] = min(cur[k], v)
            else:
                cur[k] = v
        cur['host'] = platform.node()  # provenance: cached values are host-specific
        with open(_baseline_cache_path(), 'w') as f:
            json.dump(cur, f, indent=1, sort_keys=True)
    except Exception:
        pass  # a read-only checkout must not break the bench


def _compose(x):
    """Derived metrics from whatever arms have landed (idempotent)."""
    import platform
    cached = _load_baseline_cache()
    if cached and any(k not in x for k in _BASELINE_KEYS if k in cached):
        src_host = cached.get('host')
        if src_host == platform.node():
            x.setdefault('cpu_baseline_provenance',
                         'cached: measured on this host by a previous bench run '
                         '(BENCH_BASELINES.json); live values override when they land')
        else:
            # the committed cache may come from another machine — never label a
            # foreign CPU's numbers as this host's (the bench's baseline-honesty
            # contract); a live cpu_baselines arm overrides and re-stamps the cache
            x.setdefault('cpu_baseline_provenance',
                         'cached: measured on host %r (BENCH_BASELINES.json), NOT '
                         'this host — indicative only until a live bench run '
                         're-measures here; live values override' % src_host)
    for k in _BASELINE_KEYS:
        if k in cached:
            x.setdefault(k, cached[k])
    qe_sec = x.get('qe_ptt_sec_per_est_lmax2048')
    it192 = (x.get('cinv_iters_lmax192_live') or {}).get('f32') \
        or RECORDED_ITERS['lmax192_dense64']['f32']
    p192 = x.get('cinv_tpu_ms_per_iter', {}).get('lmax192')
    p1024 = x.get('cinv_tpu_ms_per_iter', {}).get('lmax1024')
    if p192:
        x['cinv_masked_sec_to_1e-5_lmax192'] = round(p192 * it192 / 1e3, 2)
    if p1024:
        x['cinv_masked_sec_to_1e-5_lmax1024'] = round(
            p1024 * RECORDED_ITERS['lmax1024_diag']['f32'] / 1e3, 2)
    cinv192 = x.get('cinv_masked_sec_to_1e-5_lmax192')
    if cinv192 and qe_sec:
        x['sims_per_hour_filt192_qe2048'] = round(3600. / (cinv192 + qe_sec), 1)
    oc_qe = x.get('onchip_qe_ptt_step_ms_lmax2048')
    oc_it = x.get('onchip_cinv_ms_per_iter_lmax2048')
    if oc_qe and oc_it:
        sec = (oc_it * 160 + oc_qe) / 1e3
        x['onchip_sims_per_hour_lmax2048_projected'] = round(3600. / sec, 1)
    x['recorded_iters'] = RECORDED_ITERS


def _headline(synth_ms, x):
    base_ms = x.get('cpu_spin2_synth_ms_lmax2048')
    if base_ms:
        prov = x.get('cpu_baseline_provenance', '')
        if 'NOT this host' in prov:
            base_src = ('measured: this engine on one CPU core of the cache host, '
                        'not this one (see cpu_baseline_provenance)')
        else:
            base_src = ('measured: this engine on one CPU core of this host '
                        '(see cpu_baseline_note/cpu_baseline_provenance)')
        x['literature_baseline_ms'] = 2000.0
    else:
        base_ms = 2000.0
        base_src = ('healpy/libsharp-era nside-2048 spin-2 synthesis on a NERSC-class '
                    'core; literature figure (CPU measurement arm did not land)')
    return {
        'metric': 'spin2_alm2map_ms_per_map_lmax2048_batch%d' % BATCH,
        'value': round(synth_ms, 2) if synth_ms else None,
        'unit': 'ms',
        'vs_baseline': round(base_ms / synth_ms, 2) if synth_ms else None,
        'baseline_ms': round(base_ms, 1),
        'baseline_source': base_src,
        'extras': x,
    }


def _alm_size(lmax):
    from plancklens_tpu.utils import alm as ualm
    return ualm.getsize(lmax)


_CPU_PROBE_CODE = r"""
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np, time, sys
sys.path.insert(0, %(root)r)
from plancklens_tpu.ops.sht import SHT
from plancklens_tpu.utils import alm as ualm
lmax = %(lmax)d
sht = SHT(lmax, dtype=np.float32)
rng = np.random.RandomState(0); sz = ualm.getsize(lmax)
glm = (rng.standard_normal((1, sz)) + 1j*rng.standard_normal((1, sz))).astype(np.complex64)
clm = np.zeros_like(glm)
q, u = sht.alm2map_spin((glm, clm), 2); q.block_until_ready()
best = 1e30
for _ in range(2):
    t0 = time.time(); sht.alm2map_spin((glm, clm), 2)[0].block_until_ready()
    best = min(best, time.time() - t0)
import __graft_entry__ as ge
sys.path.insert(0, %(root)r)
step = ge._build_step(lmax, lmax)
tlm = glm
import jax as j
fn = j.jit(step)
fn(tlm)[0].block_until_ready()
t0 = time.time(); fn(tlm)[0].block_until_ready()
qe_ms = (time.time() - t0) * 1e3
print('PROBE', best * 1e3, qe_ms)
"""

_CINV_CODE = r"""
import jax; jax.config.update('jax_platforms','cpu')
import os, numpy as np, sys, time
sys.path.insert(0, %(root)r)
import plancklens_tpu
from plancklens_tpu.ops.sht import gl_geometry
from plancklens_tpu.models.cinv import CinvT
from plancklens_tpu.utils.cls import camb_clfile
lmax = %(lmax)d
cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                               'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
geom = gl_geometry(lmax)
omega = np.outer(geom.weight, np.full(geom.nphi, 2.*np.pi/geom.nphi))
sig = (35./60./180.*np.pi)/np.sqrt(omega)
ninv = (1./sig**2)*(np.abs(np.cos(geom.theta))[:,None] > 0.2)
cinv = CinvT(lmax, geom, cls, np.ones(lmax+1), ninv, eps_min=1e-5, iter_max=900,
             lmax_dense=64, marge_monopole=False, marge_dipole=False)
rng = np.random.RandomState(3)
tmap = rng.standard_normal((1, geom.nrings, geom.nphi))*sig[None]
t0 = time.time()
x, it, rel = cinv.solve_wf(tmap)
print('CINV', time.time() - t0, int(np.asarray(it)), float(np.asarray(rel).max()))
"""

_ROOT = os.path.dirname(os.path.abspath(__file__))


def _sub(code, cap=SUBPROC_CAP):
    env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
    env['PYTHONPATH'] = _ROOT
    try:
        out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                             text=True, timeout=cap, env=env, cwd=_ROOT)
        return out.stdout
    except Exception:
        return ''


def _cpu_probe(lmax=1024):
    for ln in (_sub(_CPU_PROBE_CODE % {'root': _ROOT, 'lmax': lmax}) or '').splitlines():
        if ln.startswith('PROBE'):
            _, ms, qe_ms = ln.split()
            return float(ms), float(qe_ms), lmax
    return None


def _cinv_live(lmax):
    for ln in (_sub(_CINV_CODE % {'root': _ROOT, 'lmax': lmax}) or '').splitlines():
        if ln.startswith('CINV'):
            _, sec, it, rel = ln.split()
            return float(sec), int(it), float(rel)
    return None, None, None


def child_main():
    """One measuring child. PLK_BENCH_CPUONLY=1 forces the CPU backend and runs the
    cost-model + measured-baseline arms (never touches the relay, so it always
    terminates); otherwise the TPU wall arms run over the relay."""
    cpu_only = os.environ.get('PLK_BENCH_CPUONLY') == '1'
    b = Bench()
    b.x['deadline_s'] = DEADLINE
    b.emit()  # a parseable line exists BEFORE backend startup (which can hang)
    import jax
    if cpu_only:
        jax.config.update('jax_platforms', 'cpu')
        b.x['device'] = 'cpu (cost-model + measured-baseline child)'
        b.emit()
        arms = [
            ('cost_sht', 45, b.arm_cost_sht),
            ('cost_cinv', 45, b.arm_cost_cinv),
            ('cost_qe_fused', 90, b.arm_cost_qe),
            ('northstar', 5, b.arm_northstar),
            ('cinv_baseline', 60, b.arm_cinv_baseline),      # measured 27 s
            ('cpu_baselines', 150, b.arm_cpu_baselines),     # measured ~80 s
        ]
    else:
        b.x['device'] = str(jax.devices()[0])
        b.emit()
        # (name, estimated worst-case seconds, fn) — relay compiles dominate
        arms = [
            ('cost_sht_pallas', 40, b.arm_cost_sht_pallas),  # AOT compile, no upload
            ('periter_192', 50, lambda: b.arm_periter(192, 'lmax192')),
            ('sht_wall', 110, b.arm_sht_wall),
            ('qe_wall', 130, b.arm_qe_wall),
            ('periter_1024', 70, lambda: b.arm_periter(1024, 'lmax1024')),
            ('sht_wall_pallas', 70, b.arm_sht_wall_pallas),
        ]
    for name, est, fn in arms:
        b.run_arm(name, est, fn)
    b.emit(final=True)


def _spawn_child(extra_env, budget):
    """Start a measuring child; returns (proc, out_list, thread)."""
    env = dict(os.environ, PLK_BENCH_CHILD='1',
               PLK_BENCH_DEADLINE=str(int(max(30, budget - 15))))
    env.update(extra_env)
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, env=env)
    out = []

    def reader():
        for ln in proc.stdout:
            ln = ln.strip()
            if ln.startswith('{'):
                out.append(ln)
                print(ln, flush=True)   # stream through: incremental contract holds
    th = threading.Thread(target=reader, daemon=True)
    th.start()
    return proc, out, th


def _wait_children(children, budget, stall=150, merge_every=20, stall_ids=None):
    """Babysit the children: kill a child at `budget` seconds or after `stall` seconds
    without a new line from it (relay hang surfaces as silence). The stall kill applies
    only to procs in `stall_ids` (default: all) — a CPU child cannot relay-hang, and
    its long measured-baseline arms are legitimately silent for minutes under host
    load, so it gets the budget kill only. Every `merge_every` seconds a MERGED
    snapshot of the two streams is printed, so a hard external kill at any moment
    still leaves a complete-so-far merged line as the last parseable output."""
    if stall_ids is None:
        stall_ids = {id(c[0]) for c in children}
    t_start = time.time()
    state = {id(c[0]): (0, time.time()) for c in children}
    notes = {}
    t_merge = time.time()
    n_last = sum(len(c[1]) for c in children)
    while any(c[0].poll() is None for c in children):
        time.sleep(2)
        n_now = sum(len(c[1]) for c in children)
        if time.time() - t_merge > merge_every and n_now != n_last:
            t_merge, n_last = time.time(), n_now
            snap = _merge(_last_parseable(children[0][1]),
                          _last_parseable(children[1][1]) if len(children) > 1 else None)
            if snap is not None:
                print(json.dumps(snap), flush=True)
        for proc, out, _ in children:
            if proc.poll() is not None:
                continue
            n_seen, t_last = state[id(proc)]
            if len(out) != n_seen:
                state[id(proc)] = (len(out), time.time())
                t_last = time.time()
            stalled = id(proc) in stall_ids and time.time() - t_last > stall
            if time.time() - t_start > budget or stalled:
                notes[id(proc)] = 'killed after %ds (%s)' % (
                    time.time() - t_start,
                    'silent %ds: relay hang' % stall if stalled
                    else 'budget %ds' % budget)
                proc.kill()
    for proc, _, th in children:
        proc.wait()
        th.join(timeout=10)
    return notes


def _last_parseable(out):
    for ln in reversed(out):
        try:
            return json.loads(ln)
        except ValueError:
            continue
    return None


def _merge(data, cpu_data):
    """Merge the TPU child's line (primary) with the CPU child's extras and rebuild the
    headline; returns None if neither child has produced anything yet."""
    if data is None and cpu_data is None:
        return None
    if data is None:
        data, cpu_data = cpu_data, None
    data = json.loads(json.dumps(data))  # deep copy: children keep streaming
    if cpu_data is not None:
        for k, v in cpu_data['extras'].items():
            if k in ('deadline_s', 'device', 'elapsed_s', 'complete', 'skipped_arms'):
                continue
            data['extras'].setdefault(k, v)
        if cpu_data['extras'].get('skipped_arms'):
            data['extras']['cpu_child_skipped_arms'] = cpu_data['extras']['skipped_arms']
    x = data['extras']
    _compose(x)
    synth_ms = data.get('value')
    if synth_ms is None and x.get('onchip_spin2_synth_ms_per_map') is not None:
        synth_ms = x['onchip_spin2_synth_ms_per_map']
        x['value_source'] = \
            'xla_cost_model_bound (relay unreachable for wall timing this run)'
    x['parent_elapsed_s'] = round(time.time() - T0, 1)
    return _headline(synth_ms, x)


def main():
    """Watchdog parent: never touches the jax backend itself, so it always terminates
    and always prints a final parseable JSON line (rc 0). The TPU wall child and the
    CPU cost/baseline child run IN PARALLEL; their extras are merged (TPU primary)."""
    if os.environ.get('PLK_BENCH_CHILD') == '1':
        child_main()
        return
    budget = max(60., DEADLINE - 30.)
    tpu = _spawn_child({}, budget)
    cpu = _spawn_child({'PLK_BENCH_CPUONLY': '1'}, budget)
    notes = _wait_children([tpu, cpu], budget, stall_ids={id(tpu[0])})
    out = _merge(_last_parseable(tpu[1]), _last_parseable(cpu[1]))
    if out is None:
        print(json.dumps({'metric': 'spin2_alm2map_ms_per_map_lmax2048_batch%d' % BATCH,
                          'value': None, 'unit': 'ms', 'vs_baseline': None,
                          'extras': {'error': 'no child produced output'}}), flush=True)
        return
    x = out['extras']
    if id(tpu[0]) in notes:
        x['tpu_child'] = notes[id(tpu[0])] + '; see docs/PERF.md relay caveats'
    x['complete'] = not notes and not x.get('skipped_arms') \
        and not x.get('cpu_child_skipped_arms')
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
