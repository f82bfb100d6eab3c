"""Round-5 review fixes: masked-ninv nlev (ADVICE r4 medium), jTP tb/eb Wiener legs,
balanced split-descriptor parsing, qecl MF containment guard + leave-one-out,
pol-only IVFCinv ergonomics, jax.random pixel noise in MapsLenNlevLib."""
import numpy as np
import pytest

from plancklens_tpu.ops.sht.geometry import gl_geometry


def _homog_ninv(geom, nlev_amin, mask=None):
    """Per-pixel inverse variance of homogeneous nlev (uK-arcmin) white noise."""
    omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
    sig2_rad = (nlev_amin / 60. / 180. * np.pi) ** 2
    ninv = omega / sig2_rad
    if mask is not None:
        ninv = ninv * mask
    return ninv


def test_nlev_ftl_masked_matches_input_level():
    """nlev must be normalised over the unmasked solid angle (reference
    filt_cinv.py:455-458): a mask must NOT inflate the recovered noise level."""
    from plancklens_tpu.models.cinv import NinvFilterT, NinvFilterP
    geom = gl_geometry(32)
    nlev = 35.
    mask = (np.abs(np.cos(geom.theta))[:, None] > 0.3) * np.ones((1, geom.nphi))
    fsky = np.sum(np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
                  * mask) / (4. * np.pi)
    assert 0.3 < fsky < 0.9  # a real cut
    bl = np.ones(33)
    filt = NinvFilterT(geom, _homog_ninv(geom, nlev, mask), bl,
                       marge_monopole=False, marge_dipole=False)
    assert abs(filt.nlev_ftl - nlev) < 1e-6 * nlev, filt.nlev_ftl
    # full-sky unchanged
    filt_full = NinvFilterT(geom, _homog_ninv(geom, nlev), bl,
                            marge_monopole=False, marge_dipole=False)
    assert abs(filt_full.nlev_ftl - nlev) < 1e-6 * nlev
    # polarisation filter, same normalisation
    filtp = NinvFilterP(geom, _homog_ninv(geom, nlev, mask), bl)
    assert abs(filtp.nlev_ftl - nlev) < 1e-6 * nlev, filtp.nlev_ftl


def test_split_descriptor_nested_high_slot():
    """'split(diag_cl, 24, split(diag_cl, 8, diag_cl))' must parse (balanced commas),
    and unbalanced parens must raise."""
    from plancklens_tpu.models.cinv import _split_top_level
    assert _split_top_level('dense, 24, split(dense, 8, diag_cl)') == \
        ['dense', '24', 'split(dense, 8, diag_cl)']
    assert _split_top_level('split(dense(k), 8, diag_cl), 24, diag_cl') == \
        ['split(dense(k), 8, diag_cl)', '24', 'diag_cl']
    with pytest.raises(AssertionError):
        _split_top_level('dense(, 8, diag_cl')
    # end-to-end through a real solver object
    from plancklens_tpu.models.cinv import CinvT, parse_pre_op_descr
    from plancklens_tpu.utils.cls import camb_clfile
    import plancklens_tpu
    import os
    lmax = 32
    geom = gl_geometry(lmax)
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    ninv = _homog_ninv(geom, 35.)
    cinv = CinvT(lmax, geom, cls, np.ones(lmax + 1), ninv, eps_min=1e-3, iter_max=50,
                 marge_monopole=False, marge_dipole=False)
    pre = parse_pre_op_descr('split(diag_cl, 8, split(diag_cl, 16, diag_cl))', cinv)
    import jax.numpy as jnp
    from plancklens_tpu.utils import alm as ualm
    r = jnp.ones((1, ualm.getsize(lmax)), dtype=np.complex64)
    out = np.asarray(pre(r))
    ref = np.asarray(cinv.pre_diag(r))
    assert np.allclose(out, ref, rtol=1e-6)  # all-diag split == plain diag


class _FakeQlm:
    """QELib stub: qlm(idx) = idx * base, so MFs are analytic."""

    def __init__(self, lmax=8):
        from plancklens_tpu.utils import alm as ualm
        self.lmax_qlm = lmax
        self.sz = ualm.getsize(lmax)
        self.ivfs1 = self.ivfs2 = object()

    def get_sim_qlm(self, k, idx):
        return np.full(self.sz, float(idx) + 10., dtype=complex)

    def get_sim_qlm_mf(self, k, mcs):
        return np.mean([self.get_sim_qlm(k, i) for i in np.asarray(mcs)], axis=0)


def test_qecl_mf_containment_guard_and_leave_one_out():
    from plancklens_tpu.models.qecl import QeClLib
    qe = _FakeQlm()
    mf_sims = np.arange(8)
    lib = QeClLib(qe, qe, mf_sims)
    # sim in the A half (even indices) raises
    with pytest.raises(ValueError):
        lib.get_sim_qcl('ptt', 0)
    with pytest.raises(ValueError):
        lib.get_sim_qcl_batch('ptt', [0, 1])
    # cross-leg containment: the bias term <q(idx), mf_other_leg> exists whichever
    # leg's MF half contains the sim, so these must raise too
    with pytest.raises(ValueError):
        lib.get_sim_qcl('ptt', 1, idx2=20)   # 1 is in the B half, used as leg-A sim
    with pytest.raises(ValueError):
        lib.get_sim_qcl('ptt', 20, idx2=0)   # 0 is in the A half, used as leg-B sim
    # sim outside the MF set is fine (as is the data index -1)
    out = lib.get_sim_qcl('ptt', 20)
    assert np.all(np.isfinite(out))
    # cross-leg leave-one-out: sim 1 (B half) excluded from the B mean-field
    loo_x = lib.get_sim_qcl('ptt', 1, idx2=20, leave_out=True)
    from plancklens_tpu.utils import alm as _ualm
    mcsB = mf_sims[1::2]
    mfA_x = qe.get_sim_qlm_mf('ptt', mf_sims[0::2])
    mfB_x = qe.get_sim_qlm_mf('ptt', mcsB[mcsB != 1])
    exp_x = np.asarray(_ualm.alm2cl(qe.get_sim_qlm('ptt', 1) - mfA_x, qe.lmax_qlm,
                                    alm2=qe.get_sim_qlm('ptt', 20) - mfB_x))
    assert np.allclose(loo_x, exp_x, rtol=1e-12)
    # leave-one-out: MF of leg A recomputed without idx -> matches manual computation
    loo = lib.get_sim_qcl('ptt', 2, leave_out=True)
    from plancklens_tpu.utils import alm as ualm
    mcsA = mf_sims[0::2]
    mfA = qe.get_sim_qlm_mf('ptt', mcsA[mcsA != 2])
    mfB = qe.get_sim_qlm_mf('ptt', mf_sims[1::2])
    expected = np.asarray(ualm.alm2cl(qe.get_sim_qlm('ptt', 2) - mfA, qe.lmax_qlm,
                                      alm2=qe.get_sim_qlm('ptt', 2) - mfB))
    assert np.allclose(loo, expected, rtol=1e-12)
    # and differs from what the biased spectrum would have been (cached under _loo key)
    assert not lib.cacher.is_cached('qcl_ptt_ptt_0002_0002')


def test_ivfcinv_pol_only_clean_errors():
    from plancklens_tpu.models.cinv import IVFCinv
    lib = IVFCinv(None, object(), None, None)  # cinv_t=None: pol-only
    with pytest.raises(ValueError):
        lib.get_ftl()
    with pytest.raises(ValueError):
        lib.get_tal('t')
    lib_t = IVFCinv(object(), None, None, None)  # T-only
    with pytest.raises(ValueError):
        lib_t.get_fel()
    with pytest.raises(ValueError):
        lib_t.get_tal('e')


def test_jtp_wiener_includes_tb_eb():
    """IVFCinvJTP._wiener must route cl['tb']/cl['eb'] legs like the reference
    library_jTP (filt_simple.py:293-342)."""
    from plancklens_tpu.models.cinv import IVFCinvJTP
    from plancklens_tpu.utils import alm as ualm
    lmax = 8
    sz = ualm.getsize(lmax)

    class _TP:
        pass
    tp = _TP()
    tp.lmax = lmax
    lib = IVFCinvJTP.__new__(IVFCinvJTP)
    lib.cinv_tp = tp
    t = np.full(sz, 1. + 0j)
    e = np.full(sz, 2. + 0j)
    b = np.full(sz, 3. + 0j)
    lib._teb = lambda idx: (t, e, b)
    one = np.ones(lmax + 1)
    lib.cl = {'tt': 1. * one, 'te': 2. * one, 'tb': 5. * one,
              'ee': 3. * one, 'eb': 7. * one, 'bb': 4. * one}
    # t row: tt*t + te*e + tb*b = 1 + 4 + 15 = 20
    assert np.allclose(np.asarray(lib.get_sim_tmliklm(0)), 20.)
    # e row: te*t + ee*e + eb*b = 2 + 6 + 21 = 29
    assert np.allclose(np.asarray(lib.get_sim_emliklm(0)), 29.)
    # b row: tb*t + eb*e + bb*b = 5 + 14 + 12 = 31
    assert np.allclose(np.asarray(lib.get_sim_bmliklm(0)), 31.)


def test_mapslennlev_noise_jax_random():
    """Pixel noise must be stateless jax.random (batchable, device-side) with the
    right level, and reproducible per (seed, idx)."""
    from plancklens_tpu.models.sims import MapsLenNlevLib
    from plancklens_tpu.ops.sht import SHT

    lmax = 16
    geom = gl_geometry(lmax)

    class _Len:
        def __init__(self):
            self.geom = geom
            self.lmax = lmax
            self.sht = SHT(geom, lmax, dtype=np.float64)

        def hashdict(self):
            return {}

        def get_sim_tmap(self, idx):
            return np.zeros((geom.nrings, geom.nphi))

        def get_sim_eblm(self, idx):
            from plancklens_tpu.utils import alm as ualm
            z = np.zeros(ualm.getsize(lmax), dtype=complex)
            return z, z

    lib = MapsLenNlevLib(_Len(), np.ones(lmax + 1), 35., 55., seed=7)
    t1 = np.asarray(lib.get_sim_tmap(3))
    t1b = np.asarray(lib.get_sim_tmap(3))
    t2 = np.asarray(lib.get_sim_tmap(4))
    assert np.array_equal(t1, t1b)          # reproducible
    assert not np.allclose(t1, t2)          # distinct sims
    # noise level: whiten by sigma and check unit variance
    omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
    sig = (35. / 60. / 180. * np.pi) / np.sqrt(omega)
    white = t1 / sig
    assert abs(np.std(white) - 1.) < 0.05
    q, u = lib.get_sim_pmap(3)
    assert not np.allclose(np.asarray(q), np.asarray(u))  # independent Q/U draws
    sigp = (55. / 60. / 180. * np.pi) / np.sqrt(omega)
    assert abs(np.std(np.asarray(q) / sigp) - 1.) < 0.05
