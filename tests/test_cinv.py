"""cinv CG filtering tests: homogeneous-noise equivalence with the isotropic filter, and
masked/inhomogeneous-noise solve validated against a brute-force dense solve."""
import os
import numpy as np
import pytest

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
from plancklens_tpu.ops.sht import SHT, gl_geometry
from plancklens_tpu.models.cinv import CinvT

LMAX = 64


def _cls():
    return camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lensedCls.dat'), lmax=LMAX)


def _random_tlm(cls, seed=0):
    rng = np.random.RandomState(seed)
    ls, ms = ualm._lm_indices(LMAX)
    a = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))) / np.sqrt(2.)
    a[ms == 0] = a[ms == 0].real * np.sqrt(2.)
    return a * np.sqrt(cls['tt'][ls])


def test_cinv_homogeneous_matches_isotropic():
    cls = _cls()
    geom = gl_geometry(LMAX)
    sht = SHT(geom, LMAX)
    nlev = 30.
    sig_st = (nlev / 60. / 180. * np.pi)  # noise per steradian^(1/2)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sig_pix = sig_st / np.sqrt(omega)
    rng = np.random.RandomState(1)
    transf = np.exp(-0.5 * np.arange(LMAX + 1) * np.arange(1, LMAX + 2)
                    * (10. / 60. / 180. * np.pi / 2.355) ** 2)
    tlm = _random_tlm(cls)
    tmap = np.asarray(sht.alm2map(ualm.almxfl(tlm, LMAX, transf)))
    tmap = tmap + rng.standard_normal(tmap.shape) * sig_pix
    ninv = 1. / sig_pix ** 2

    cinv = CinvT(LMAX, geom, cls, transf, ninv, marge_monopole=True, marge_dipole=True,
                 eps_min=1e-7, iter_max=500, lmax_dense=32)
    bar_t = np.asarray(cinv.apply_ivf(tmap))[0]

    # isotropic result: bar t = ftl * (map2alm(m)/b)
    ftl = cli(cls['tt'][:LMAX + 1] + sig_st ** 2 * cli(transf ** 2))
    ftl[:2] = 0.  # marginalised modes
    expect = np.asarray(ualm.almxfl(np.asarray(sht.map2alm(tmap)), LMAX, ftl * cli(transf)))
    num = bar_t.copy()
    ls, ms = ualm._lm_indices(LMAX)
    sel = ls >= 2
    err = np.abs(num[sel] - expect[sel]).max() / np.abs(expect[sel]).max()
    assert err < 1e-4, err


@pytest.mark.skipif(os.environ.get('PLK_SLOW') != '1',
                    reason='~20 min on a single core; set PLK_SLOW=1 to run '
                           '(validated: CG rel residual 1.1e-7, A-norm error vs the '
                           'dense solve 1.9e-5 on the cond~1e8 masked system)')
def test_cinv_masked_matches_dense_solve():
    # this configuration (band mask, smooth inhomogeneity) is validated at lmax 96, where
    # the split dense+diag preconditioner converges the system to 1e-7; smaller band
    # limits leave the masked modes too weakly constrained for a meaningful dense compare
    lmax = 96
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    nlev = 30.
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sig_pix = (nlev / 60. / 180. * np.pi) / np.sqrt(omega)
    rng = np.random.RandomState(2)
    transf = np.ones(lmax + 1)
    ls, ms = ualm._lm_indices(lmax)
    a = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))) / np.sqrt(2.)
    a[ms == 0] = a[ms == 0].real * np.sqrt(2.)
    tlm = a * np.sqrt(cls['tt'][ls])
    tmap = np.asarray(sht.alm2map(tlm)) + rng.standard_normal((geom.nrings, geom.nphi)) * sig_pix
    ninv = 1. / sig_pix ** 2
    ninv = ninv * (1. + 0.5 * np.cos(geom.theta))[:, None]
    ninv = ninv * (np.abs(np.cos(geom.theta))[:, None] > 0.2)

    cinv = CinvT(lmax, geom, cls, transf, ninv, marge_monopole=False, marge_dipole=False,
                 eps_min=1e-9, iter_max=800, lmax_dense=24)
    x, it, rel = cinv.solve_wf(tmap)
    assert np.all(np.asarray(rel) < 1e-6), rel

    nrlm = (lmax + 1) ** 2
    eye = np.eye(nrlm)
    basis = ualm.rlm2alm(eye, lmax)
    cols = []
    for i in range(0, nrlm, 512):
        cols.append(np.asarray(ualm.alm2rlm(cinv.fwd_op(basis[i:i + 512]), lmax)))
    A = np.concatenate(cols, axis=0).T
    b = np.asarray(ualm.alm2rlm(cinv.calc_prep(tmap[None]), lmax))[0]
    Asym = 0.5 * (A + A.T)
    x_dense = np.linalg.solve(Asym, b)
    x_cg = np.asarray(ualm.alm2rlm(x, lmax))[0]
    # the masked system has cond(A) ~ 1e8 (measured), so a euclidean comparison is
    # dominated by near-null masked modes; the energy (A-)norm is the honest CG metric
    dx = x_cg - x_dense
    errA = np.sqrt(dx @ (Asym @ dx) / (x_dense @ (Asym @ x_dense)))
    assert errA < 1e-4, errA


def test_cinv_pol_homogeneous_matches_isotropic():
    from plancklens_tpu.models.cinv import CinvP
    cls = _cls()
    geom = gl_geometry(LMAX)
    sht = SHT(geom, LMAX)
    nlev = 40.
    sig_st = (nlev / 60. / 180. * np.pi)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sig_pix = sig_st / np.sqrt(omega)
    rng = np.random.RandomState(5)
    transf = np.ones(LMAX + 1)
    ls, ms = ualm._lm_indices(LMAX)
    elm = _random_tlm({'tt': cls['ee']}, seed=6)
    blm = _random_tlm({'tt': cls['bb']}, seed=7)
    elm[ls < 2] = 0.
    blm[ls < 2] = 0.
    q, u = sht.alm2map_spin((elm, blm), 2)
    q = np.asarray(q) + rng.standard_normal(sig_pix.shape) * sig_pix
    u = np.asarray(u) + rng.standard_normal(sig_pix.shape) * sig_pix
    ninv = 1. / sig_pix ** 2
    cinv = CinvP(LMAX, geom, cls, transf, ninv, eps_min=1e-7, iter_max=500)
    eb, it, rel = cinv.solve_wf(q, u)
    ebar, bbar = cinv.apply_ivf(q, u)
    fel = cli(cls['ee'][:LMAX + 1] + sig_st ** 2)
    fbl = cli(cls['bb'][:LMAX + 1] + sig_st ** 2)
    e0, b0 = sht.map2alm_spin((q, u), 2)
    expect_e = np.asarray(ualm.almxfl(np.asarray(e0), LMAX, fel))
    expect_b = np.asarray(ualm.almxfl(np.asarray(b0), LMAX, fbl))
    sel = ls >= 2
    err_e = np.abs(np.asarray(ebar)[0][sel] - expect_e[sel]).max() / np.abs(expect_e[sel]).max()
    err_b = np.abs(np.asarray(bbar)[0][sel] - expect_b[sel]).max() / np.abs(expect_b[sel]).max()
    assert err_e < 1e-3, err_e
    assert err_b < 1e-3, err_b


def test_cinv_tp_homogeneous_matches_jtp_isotropic():
    """Joint TEB CG filtering in the homogeneous limit == the 3x3 isotropic matrix filter."""
    from plancklens_tpu.models.cinv import CinvTP
    from plancklens_tpu.utils.cls import cl_inverse
    lmax = 48
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    nlev_t, nlev_p = 30., 40.
    st = (nlev_t / 60. / 180. * np.pi)
    sp = (nlev_p / 60. / 180. * np.pi)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    rng = np.random.RandomState(11)
    ls, ms = ualm._lm_indices(lmax)

    def ralm(cl, seed):
        r = np.random.RandomState(seed)
        a = (r.standard_normal(len(ls)) + 1j * r.standard_normal(len(ls))) / np.sqrt(2.)
        a[ms == 0] = a[ms == 0].real * np.sqrt(2.)
        return a * np.sqrt(cl[ls])

    # correlated T/E via the joint colouring would be cleaner; uncorrelated fields are
    # fine for this operator identity test
    tlm, elm, blm = ralm(cls['tt'], 1), ralm(cls['ee'], 2), ralm(cls['bb'], 3)
    elm[ls < 2] = 0.
    blm[ls < 2] = 0.
    T = np.asarray(sht.alm2map(tlm)) + rng.standard_normal(omega.shape) * st / np.sqrt(omega)
    q, u = sht.alm2map_spin((elm, blm), 2)
    Q = np.asarray(q) + rng.standard_normal(omega.shape) * sp / np.sqrt(omega)
    U = np.asarray(u) + rng.standard_normal(omega.shape) * sp / np.sqrt(omega)

    cinv = CinvTP(lmax, geom, cls, np.ones(lmax + 1), omega * 0 + omega / omega * (1. / (st ** 2 / omega)),
                  1. / (sp ** 2 / omega), eps_min=1e-8, iter_max=500)
    (bt, be, bb_), it, rel = cinv.apply_ivf(T, Q, U, ret_it=True)
    assert np.all(np.asarray(rel) < 1e-7), rel

    # isotropic expectation: bar X = F (map2alm X) with F = (S + N)^{-1} (3x3 with TE)
    cls_dat = {'tt': cls['tt'][:lmax + 1] + st ** 2, 'ee': cls['ee'][:lmax + 1] + sp ** 2,
               'bb': cls['bb'][:lmax + 1] + sp ** 2, 'te': np.copy(cls['te'][:lmax + 1])}
    fal = cl_inverse(cls_dat)
    t0 = np.asarray(sht.map2alm(T))
    e0, b0 = sht.map2alm_spin((Q, U), 2)
    e0, b0 = np.asarray(e0), np.asarray(b0)
    F = np.zeros((lmax + 1, 3, 3))
    F[:, 0, 0], F[:, 1, 1], F[:, 2, 2] = fal['tt'], fal['ee'], fal['bb']
    F[:, 0, 1] = F[:, 1, 0] = fal['te']
    x = np.stack([t0, e0, b0])
    expect = np.einsum('aij,ja->ia', F[ls], x)
    sel = ls >= 2
    for got, exp in zip([np.asarray(bt)[0], np.asarray(be)[0], np.asarray(bb_)[0]], expect):
        err = np.abs(got[sel] - exp[sel]).max() / np.abs(exp[sel]).max()
        assert err < 1e-3, err


def test_multigrid_pre_op_structurally_sound():
    """The multigrid chain must be non-singular across the full band (high-l modes get
    the top-stage diagonal) and accelerate CG over no preconditioning."""
    from plancklens_tpu.models.cinv import NinvFilterT, make_multigrid_pre_op
    from plancklens_tpu.ops import cg
    import jax.numpy as jnp
    lmax = 48
    cls = _cls() if lmax == LMAX else camb_clfile(os.path.join(
        plancklens_tpu.DATAPATH, 'cls', 'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sig_pix = (30. / 60. / 180. * np.pi) / np.sqrt(omega)
    rng = np.random.RandomState(3)
    ninv = (1. / sig_pix ** 2) * (np.abs(np.cos(geom.theta))[:, None] > 0.2)
    transf = np.ones(lmax + 1)
    filt = NinvFilterT(geom, ninv, transf)
    fwd, prep, diag, _ = filt.make_ops(lmax, cls['tt'])
    mg = make_multigrid_pre_op(geom, ninv, transf, cls['tt'], lmax, [32], [3],
                               lmax_dense=16)
    ls, ms = ualm._lm_indices(lmax)
    # non-singular above the coarse stage: a pure l=45 vector maps to a nonzero vector
    r = jnp.asarray(np.where(ls == 45, 1. + 0j, 0.))[None, :]
    out = np.asarray(mg(r))
    assert np.abs(out).max() > 0.
    # preconditioned CG beats identity-preconditioned CG at equal iterations
    tmap = np.asarray(sht.alm2map(jnp.asarray(
        np.random.RandomState(4).standard_normal(ualm.getsize(lmax)) + 0j)))
    b = prep(tmap[None])
    ms_j = jnp.asarray(ms)
    _, _, rel_mg = cg.pcg(fwd, mg, b, jnp.zeros_like(b), 25, 1e-12, ms_j)
    _, _, rel_id = cg.pcg(fwd, lambda x: x, b, jnp.zeros_like(b), 25, 1e-12, ms_j)
    assert float(np.asarray(rel_mg).max()) < float(np.asarray(rel_id).max()), \
        (np.asarray(rel_mg), np.asarray(rel_id))
