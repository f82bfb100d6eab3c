"""Pallas synthesis kernel vs the XLA scan engine (interpret mode on CPU)."""
import numpy as np
import jax

from plancklens_tpu.ops.sht import core
from plancklens_tpu.ops.sht.geometry import gl_geometry
from plancklens_tpu.ops.sht.pallas_kernel import legendre_synth_pallas


def test_pallas_synth_matches_xla():
    lmax, B = 160, 2
    geom = gl_geometry(lmax)
    t = core.recursion_tables(lmax, lmax, -2, geom.theta, dtype=np.float32)
    rng = np.random.RandomState(0)
    C = (rng.standard_normal((B, lmax + 1, lmax + 1))
         + 1j * rng.standard_normal((B, lmax + 1, lmax + 1))).astype(np.complex64)
    x = np.cos(geom.theta)
    Gp = np.asarray(legendre_synth_pallas(C, t, x, interpret=True))
    Gx = np.asarray(core.legendre_synth(C, -2, geom.theta, dtype=np.float32))
    err = np.abs(Gp - Gx).max() / np.abs(Gx).max()
    assert err < 1e-5, err


def test_pallas_anal_matches_xla():
    lmax, B = 160, 2
    geom = gl_geometry(lmax)
    t = core.recursion_tables(lmax, lmax, 2, geom.theta, dtype=np.float32)
    rng = np.random.RandomState(1)
    nrings = len(geom.theta)
    Q = (rng.standard_normal((B, nrings, lmax + 1))
         + 1j * rng.standard_normal((B, nrings, lmax + 1))).astype(np.complex64)
    Q = Q * geom.weight[None, :, None].astype(np.float32)
    x = np.cos(geom.theta)
    from plancklens_tpu.ops.sht.pallas_kernel import legendre_anal_pallas
    Ap = np.asarray(legendre_anal_pallas(Q, t, x, lmax, interpret=True))
    Ax = np.asarray(core.legendre_anal(Q, 2, geom.theta, lmax, dtype=np.float32))
    err = np.abs(Ap - Ax).max() / np.abs(Ax).max()
    assert err < 1e-5, err


def test_sht_pallas_engine_matches_xla():
    """The public SHT API with engine='pallas' (interpret on CPU) == the XLA engine."""
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.utils import alm as ualm
    lmax = 96
    geom = gl_geometry(lmax)
    rng = np.random.RandomState(2)
    ls, ms = ualm._lm_indices(lmax)
    g = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))).astype(np.complex64)
    c = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))).astype(np.complex64)
    g[ms == 0] = g[ms == 0].real
    c[ms == 0] = c[ms == 0].real
    g[ls < 2] = 0.
    c[ls < 2] = 0.
    sx = SHT(geom, lmax, dtype=np.float32)
    sp = SHT(geom, lmax, dtype=np.float32, engine='pallas')
    qx, ux = sx.alm2map_spin((g, c), 2)
    qp, up = sp.alm2map_spin((g, c), 2)
    scale = np.abs(np.asarray(qx)).max()
    assert np.abs(np.asarray(qp) - np.asarray(qx)).max() < 1e-5 * scale
    assert np.abs(np.asarray(up) - np.asarray(ux)).max() < 1e-5 * scale
    gx, cx = sx.map2alm_spin((qx, ux), 2)
    gp, cp = sp.map2alm_spin((qx, ux), 2)
    assert np.abs(np.asarray(gp) - np.asarray(gx)).max() < 1e-5 * np.abs(np.asarray(gx)).max()
    # scalar path
    tx = sx.alm2map(g)
    tp = sp.alm2map(g)
    assert np.abs(np.asarray(tp) - np.asarray(tx)).max() < 1e-5 * np.abs(np.asarray(tx)).max()
    bx = np.asarray(sx.map2alm(tx))
    bp = np.asarray(sp.map2alm(tx))
    assert np.abs(bp - bx).max() < 1e-5 * np.abs(bx).max()


def test_pallas_entry_point_coerces_f64_tables():
    """core.legendre_synth/anal with engine='pallas' and the DEFAULT f64 dtype must
    feed f32-scaled tables to the f32-only kernel (f64 tables carry S=256 whose seeds
    overflow to inf in f32 — round-4 review finding)."""
    lmax, B = 96, 1
    geom = gl_geometry(lmax)
    rng = np.random.RandomState(3)
    C = (rng.standard_normal((B, lmax + 1, lmax + 1))
         + 1j * rng.standard_normal((B, lmax + 1, lmax + 1))).astype(np.complex64)
    Gp = np.asarray(core.legendre_synth(C, 0, geom.theta, engine='pallas'))  # f64 default
    assert np.all(np.isfinite(Gp))
    Gx = np.asarray(core.legendre_synth(C, 0, geom.theta, dtype=np.float32))
    assert np.abs(Gp - Gx).max() / np.abs(Gx).max() < 1e-5
    nrings = len(geom.theta)
    Q = (rng.standard_normal((B, nrings, lmax + 1))
         + 1j * rng.standard_normal((B, nrings, lmax + 1))).astype(np.complex64)
    Ap = np.asarray(core.legendre_anal(Q, 0, geom.theta, lmax, engine='pallas'))
    assert np.all(np.isfinite(Ap))
    Ax = np.asarray(core.legendre_anal(Q, 0, geom.theta, lmax, dtype=np.float32))
    assert np.abs(Ap - Ax).max() / np.abs(Ax).max() < 1e-5


def test_pallas_pair_kernels_used_and_match_all_spins():
    """engine='pallas' on a symmetric grid must route through the FUSED NS-pair
    kernels (not the plain per-transform fallback) and match the XLA engine at f32
    for spins 0..3, synthesis and analysis."""
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.ops.sht import pallas_kernel as pk
    from plancklens_tpu.ops.sht import core
    from plancklens_tpu.utils import alm as ualm
    calls = {'synth': 0, 'anal': 0}
    orig_s, orig_a = pk.legendre_synth_pair_pallas, pk.legendre_anal_pair_pallas

    def count_s(*a, **k):
        calls['synth'] += 1
        return orig_s(*a, **k)

    def count_a(*a, **k):
        calls['anal'] += 1
        return orig_a(*a, **k)

    pk.legendre_synth_pair_pallas = count_s
    pk.legendre_anal_pair_pallas = count_a
    try:
        lmax = 64
        geom = gl_geometry(lmax)
        rng = np.random.RandomState(5)
        ls, ms = ualm._lm_indices(lmax)
        sx = SHT(geom, lmax, dtype=np.float32)
        sp = SHT(geom, lmax, dtype=np.float32, engine='pallas')

        def mk_alm(seed):
            g = (rng.standard_normal(len(ls))
                 + 1j * rng.standard_normal(len(ls))).astype(np.complex64)
            g[ms == 0] = g[ms == 0].real
            return g

        for spin in (1, 2, 3):
            g, c = mk_alm(0), mk_alm(1)
            g[ls < spin] = 0.
            c[ls < spin] = 0.
            qx, ux = sx.alm2map_spin((g, c), spin)
            qp, up = sp.alm2map_spin((g, c), spin)
            scale = np.abs(np.asarray(qx)).max()
            assert np.abs(np.asarray(qp) - np.asarray(qx)).max() < 2e-5 * scale, spin
            assert np.abs(np.asarray(up) - np.asarray(ux)).max() < 2e-5 * scale, spin
            gx, cx = sx.map2alm_spin((qx, ux), spin)
            gp, cp = sp.map2alm_spin((qx, ux), spin)
            s2 = np.abs(np.asarray(gx)).max()
            assert np.abs(np.asarray(gp) - np.asarray(gx)).max() < 2e-5 * s2, spin
            assert np.abs(np.asarray(cp) - np.asarray(cx)).max() < 2e-5 * s2, spin
            # round trip through the pallas engine alone
            g2, c2 = sp.map2alm_spin(sp.alm2map_spin((g, c), spin), spin)
            assert np.abs(np.asarray(g2) - g).max() < 5e-5 * np.abs(g).max(), spin
        assert calls['synth'] >= 3 and calls['anal'] >= 6, calls
    finally:
        pk.legendre_synth_pair_pallas = orig_s
        pk.legendre_anal_pair_pallas = orig_a


def test_pallas_pair_batched_and_mmax():
    """Batched alms with leading dims, and an azimuthal band limit mmax < lmax."""
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.utils import alm as ualm
    lmax, mmax = 48, 20
    geom = gl_geometry(lmax)
    rng = np.random.RandomState(7)
    ls, ms = ualm._lm_indices(lmax)
    g = (rng.standard_normal((2, 3, len(ls)))
         + 1j * rng.standard_normal((2, 3, len(ls)))).astype(np.complex64)
    g[..., ms == 0] = g[..., ms == 0].real
    sx = SHT(geom, lmax, mmax=mmax, dtype=np.float32)
    sp = SHT(geom, lmax, mmax=mmax, dtype=np.float32, engine='pallas')
    tx = np.asarray(sx.alm2map(g))
    tp = np.asarray(sp.alm2map(g))
    assert tp.shape == tx.shape == (2, 3, geom.nrings, geom.nphi)
    assert np.abs(tp - tx).max() < 2e-5 * np.abs(tx).max()
    ax = np.asarray(sx.map2alm(tx))
    ap = np.asarray(sp.map2alm(tx))
    assert np.abs(ap - ax).max() < 2e-5 * np.abs(ax).max()


def test_pallas_cost_model_below_xla_engine():
    """The design claim: the fused kernels' HBM traffic statement at lmax 2048 sits
    far below the XLA scan engine's measured 37 GB/map analysis (BENCH_r04); checked
    here on the analytic formulas (cheap, no compile)."""
    from plancklens_tpu.ops.sht import pallas_kernel as pk
    lmaxp1, B2, nh = 2049, 8, 1025  # 4 maps folded
    _, s_bytes = pk.synth_pair_cost(lmaxp1, B2, lmaxp1, nh, False)
    _, a_bytes = pk.anal_pair_cost(lmaxp1, B2, lmaxp1, nh, False)
    assert s_bytes / 4 < 1e9, s_bytes      # < 1 GB/map (XLA engine: 4.15 GB/map)
    assert a_bytes / 4 < 1e9, a_bytes      # < 1 GB/map (XLA engine: 9.3 GB/map)


def test_pallas_engine_default_resolution():
    """Engine default: explicit arg > $PLK_SHT_ENGINE > backend rule (pallas on TPU
    f32, xla elsewhere). On the CPU test backend the default must stay 'xla'."""
    import os
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    geom = gl_geometry(16)
    assert SHT(geom, 16, dtype=np.float32).engine == 'xla'
    old = os.environ.get('PLK_SHT_ENGINE')
    os.environ['PLK_SHT_ENGINE'] = 'pallas'
    try:
        assert SHT(geom, 16, dtype=np.float32).engine == 'pallas'
        assert SHT(geom, 16, dtype=np.float32, engine='xla').engine == 'xla'
    finally:
        if old is None:
            del os.environ['PLK_SHT_ENGINE']
        else:
            os.environ['PLK_SHT_ENGINE'] = old
