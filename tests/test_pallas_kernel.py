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
