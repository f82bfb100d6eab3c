"""Regression tests for the round-5 (continuation) review findings: noise-accessor
dtype parity, fsky geometry discovery for pol-only / joint-TP cinv adapters,
mismatched-mask degrade, quoted-comma descriptors, atomic pixwin write-back, and
bench baseline-cache provenance."""
import os
import sys
import types

import numpy as np
import pytest

from plancklens_tpu.ops.sht import SHT, gl_geometry
from plancklens_tpu.utils import alm as ualm


# ----------------------------------------------------------------- noise dtype
def test_noise_accessors_match_map_path_dtype():
    """get_sim_tnoise/qnoise/unoise must return the exact realisation entering
    get_sim_tmap/get_sim_pmap also when the SHT pipeline runs at f32 under x64
    (jax.random.normal draws different values, not rounded ones, per dtype)."""
    from plancklens_tpu.models.sims import MapsLenNlevLib
    lmax = 16
    geom = gl_geometry(lmax)

    class _ZeroLen:  # zero signal: observed map == noise realisation
        def __init__(self, dtype):
            self.geom = geom
            self.lmax = lmax
            self.sht = SHT(geom, lmax, dtype=dtype)

        def hashdict(self):
            return {}

        def get_sim_tmap(self, idx):
            return np.zeros((geom.nrings, geom.nphi), dtype=self.sht.dtype)

        def get_sim_eblm(self, idx):
            z = np.zeros(ualm.getsize(lmax),
                         dtype=np.complex64 if self.sht.dtype == np.float32
                         else np.complex128)
            return z, z

    for dtype in (np.float32, np.float64):
        lib = MapsLenNlevLib(_ZeroLen(dtype), np.ones(lmax + 1), 35., 55., seed=7)
        obs = np.asarray(lib.get_sim_tmap(3))
        noi = np.asarray(lib.get_sim_tnoise(3))
        assert noi.dtype == obs.dtype, (dtype, noi.dtype, obs.dtype)
        np.testing.assert_array_equal(obs, noi)
        q, u = (np.asarray(m) for m in lib.get_sim_pmap(3))
        np.testing.assert_array_equal(q, np.asarray(lib.get_sim_qnoise(3)))
        np.testing.assert_array_equal(u, np.asarray(lib.get_sim_unoise(3)))


# ------------------------------------------------------------- fsky discovery
def _masked_lib(mask, geom, attr):
    """Minimal filtering-library stand-in carrying the mask + a cinv flavour."""
    lib = types.SimpleNamespace(get_fmask=lambda: mask)
    setattr(lib, attr, types.SimpleNamespace(geom=geom))
    return lib


@pytest.mark.parametrize('attr', ['cinv_t', 'cinv_p', 'cinv_tp'])
def test_get_fsky_geometry_weighted_all_cinv_flavours(attr):
    """Pol-only (cinv_p) and joint (cinv_tp) adapters must get the same
    quadrature-weighted fsky as cinv_t ones: on a GL grid a |cos th| > 0.2 cut is
    exactly 20% of the sky, while an unweighted ring mean is ~13% (rings are
    ~uniform in theta, not in area)."""
    from plancklens_tpu.models.qest import QELib
    lmax = 256
    geom = gl_geometry(lmax)
    mask = (np.abs(np.cos(geom.theta))[:, None] > 0.2) * np.ones((1, geom.nphi))
    # the ring-discretised cut's TRUE area: quadrature weights of the kept rings
    truth = float(np.sum(geom.weight[np.abs(np.cos(geom.theta)) > 0.2])
                  * 2. * np.pi * geom.nphi / geom.nphi / (4. * np.pi))
    lib = _masked_lib(mask, geom, attr)
    qe = QELib(lib, lib, {}, lmax, lmax)
    assert abs(qe.get_fsky(11) - truth) < 1e-12, (attr, qe.get_fsky(11), truth)
    assert abs(truth - 0.8) < 0.01          # ... which is the 20% galactic cut
    assert abs(np.mean(mask) - 0.8) > 0.05  # the unweighted mean WOULD be wrong


def test_get_fsky_mismatched_mask_shapes_degrades_to_one():
    """Legs with different-shaped masks degrade to fsky = 1 (like qecl._fskies)
    instead of raising a broadcast error."""
    from plancklens_tpu.models.qest import QELib
    g1, g2 = gl_geometry(16), gl_geometry(32)
    m1 = np.ones((g1.nrings, g1.nphi))
    m2 = np.ones((g2.nrings, g2.nphi))
    qe = QELib(_masked_lib(m1, g1, 'cinv_t'), _masked_lib(m2, g2, 'cinv_t'),
               {}, 16, 16)
    assert qe.get_fsky(12) == 1.


def test_qecl_and_qest_fsky_share_one_implementation():
    """The qecl four-leg fskies ride the same filt helper (no drift): a pol-only
    masked leg gives the same area-weighted answer in both."""
    from plancklens_tpu.models.filt import mask_geom, fsky_mean
    lmax = 256
    geom = gl_geometry(lmax)
    keep = np.abs(np.cos(geom.theta)) > 0.2
    mask = keep[:, None] * np.ones((1, geom.nphi))
    truth = float(np.sum(geom.weight[keep]) / 2.)  # GL weights sum to 2 over cos(th)
    lib = _masked_lib(mask, geom, 'cinv_p')
    ms, mean = fsky_mean([mask_geom(lib)] * 4)
    assert abs(mean(ms[0] * ms[1] * ms[2] * ms[3]) - truth) < 1e-12


# --------------------------------------------------------- descriptor parsing
def test_split_top_level_honours_quoted_commas():
    from plancklens_tpu.models.cinv import _split_top_level
    args = _split_top_level('dense("a,b"), 64, diag_cl')
    assert args == ['dense("a,b")', '64', 'diag_cl']
    args = _split_top_level("dense, 24, split(dense, 8, diag_cl)")
    assert args == ['dense', '24', 'split(dense, 8, diag_cl)']
    with pytest.raises(AssertionError):
        _split_top_level('dense("a,b, 64, diag_cl')  # unterminated quote


# ------------------------------------------------------------- pixwin atomics
def test_pixwin_writeback_is_atomic_and_loadable(tmp_path, monkeypatch):
    from plancklens_tpu.ops.sht import pixwin as pw
    monkeypatch.setattr(pw, '_TABLE_DIR', str(tmp_path))
    monkeypatch.setattr(pw, '_MEM_CACHE', {})
    out = pw._exact_table(2, pol=False)
    fn = tmp_path / 'pixwin_n0002.npy'
    assert fn.exists()
    np.testing.assert_allclose(np.load(fn), np.asarray(out), rtol=0, atol=0)
    leftovers = [p for p in os.listdir(tmp_path) if '.tmp' in p]
    assert leftovers == [], leftovers  # tmp file renamed away, nothing truncated
    # a fresh process state (cleared mem cache) must reload the table, not recompute
    monkeypatch.setattr(pw, '_MEM_CACHE', {})
    np.testing.assert_array_equal(np.asarray(pw._exact_table(2)), np.asarray(out))


# ------------------------------------------------------- bench baseline cache
def test_bench_baseline_cache_provenance_flags_foreign_host(monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    foreign = {'host': 'someone-elses-box', 'cpu_spin2_synth_ms_lmax2048': 100.0}
    monkeypatch.setattr(bench, '_load_baseline_cache', lambda: foreign)
    x = {}
    bench._compose(x)
    assert 'NOT this host' in x['cpu_baseline_provenance']
    assert x['cpu_spin2_synth_ms_lmax2048'] == 100.0  # still usable as fallback
    assert 'host' not in x  # bookkeeping keys do not leak into extras
    head = bench._headline(10.0, x)
    assert 'not this one' in head['baseline_source']

    # same-host cache keeps the first-person label
    import platform
    local = {'host': platform.node(), 'cpu_spin2_synth_ms_lmax2048': 100.0}
    monkeypatch.setattr(bench, '_load_baseline_cache', lambda: local)
    x2 = {}
    bench._compose(x2)
    assert 'NOT this host' not in x2['cpu_baseline_provenance']
    assert 'this host' in bench._headline(10.0, x2)['baseline_source']
