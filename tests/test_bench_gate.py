"""Driver-gate contract of bench.py: whatever the state of the TPU relay (live, slow,
or hung — the latter observed for hours on 2026-08-18), the watchdog parent must exit
0 within its deadline and leave a parseable final JSON line carrying the on-chip
cost-model entries (computed by the CPU fallback child when the relay cannot be
reached). This is the gate that produced rc=124 in round 3; this test keeps it green.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_always_emits_parseable_json():
    env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
    env['PLK_BENCH_DEADLINE'] = '330'   # tight: ~160 s tpu child + fallback
    out = subprocess.run([sys.executable, os.path.join(ROOT, 'bench.py')],
                         capture_output=True, text=True, timeout=480, env=env)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip().startswith('{')]
    assert lines, out.stdout[-500:]
    final = json.loads(lines[-1])
    assert final['metric'].startswith('spin2_alm2map_ms_per_map'), final['metric']
    x = final['extras']
    # the four BASELINE metrics' on-chip statements must be present however the
    # relay behaved (TPU child or CPU cost-model fallback)
    for k in ('onchip_spin2_synth_ms_per_map', 'onchip_spin2_anal_ms_per_map',
              'onchip_cinv_ms_per_iter_lmax2048', 'onchip_qe_ptt_step_ms_lmax2048'):
        assert x.get(k) is not None, (k, sorted(x))
    assert x.get('onchip_sims_per_hour_lmax2048_projected') is not None
    assert final['value'] is not None and final['vs_baseline'] is not None
