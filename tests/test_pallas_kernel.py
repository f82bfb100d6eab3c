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
