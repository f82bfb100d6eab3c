"""Coverage for the small wrapper components: QeClAverage, IVFFml, sql stores, cachers."""
import os
import tempfile
import numpy as np

from plancklens_tpu.utils.sql import npdb, fldb
from plancklens_tpu.utils.cachers import cacher_mem, cacher_npy, cacher_none
from plancklens_tpu.utils import alm as ualm


def test_sql_stores():
    with tempfile.TemporaryDirectory() as d:
        db = npdb(os.path.join(d, 't.db'))
        db.add('x', np.arange(5.))
        assert np.all(db.get('x') == np.arange(5.))
        db.add('x', np.arange(3.))  # add-if-absent: first write wins
        assert len(db.get('x')) == 5
        db.remove('x')
        assert db.get('x') is None
        f = fldb(os.path.join(d, 'f.db'))
        f.add('a', 3.14)
        assert f.get('a') == 3.14


def test_cachers():
    with tempfile.TemporaryDirectory() as d:
        for c in [cacher_mem(), cacher_npy(d)]:
            assert not c.is_cached('k')
            c.cache('k', np.arange(4))
            assert c.is_cached('k')
            assert np.all(np.asarray(c.load('k')) == np.arange(4))
        assert not cacher_none().is_cached('k')


def test_ivffml():
    from plancklens_tpu.models.filt import IVFFml

    class FakeIvfs:
        def get_sim_tlm(self, idx):
            return np.ones(ualm.getsize(8), dtype=complex)

        def hashdict(self):
            return {}

    fml = np.zeros((9, 9))
    ls, ms = ualm._lm_indices(8)
    fml[ls, ms] = ls  # multiply each coefficient by its l
    out = np.asarray(IVFFml(FakeIvfs(), fml, fml, fml).get_sim_tlm(0))
    assert out[ualm.getidx(8, 5, 2)] == 5.


def test_qecl_average():
    from plancklens_tpu.models.qecl import QeClAverage

    class FakeQcl:
        lmax_qlm = 8

        def __init__(self, val):
            self.val = val

        def get_sim_qcl(self, k1, idx, k2=None, idx2=None):
            return np.full(9, self.val)

        def hashdict(self):
            return {'v': self.val}

    avg = QeClAverage([FakeQcl(1.), FakeQcl(3.)])
    assert np.allclose(avg.get_sim_qcl('ptt', 0), 2.)
    st = avg.get_sim_stats_qcl('ptt', [0, 1, 2])
    assert np.allclose(st.mean(), 2.)


def test_alm_nlev_lib_widnoise():
    """AlmNlevLib (widnoise-style re-observation of external alms): spectra must match
    b^2 C + N and realisations must be deterministic per index."""
    import numpy as np
    import plancklens_tpu, os
    from plancklens_tpu.utils import camb_clfile, alm as ualm
    from plancklens_tpu.models.sims import CMBUnlLib, AlmNlevLib
    lmax = 64
    cls = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                   'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    cmb = CMBUnlLib(cls, lmax, fields='teb')  # stands in for an ExternalAlmLib
    transf = np.exp(-0.01 * np.arange(lmax + 1))
    nlev_t = 30.
    lib = AlmNlevLib(cmb, lmax, transf, nlev_t, 40. * np.sqrt(2))
    t0 = np.asarray(lib.get_sim_tlm(3))
    assert np.allclose(t0, np.asarray(lib.get_sim_tlm(3)))  # deterministic
    assert not np.allclose(t0, np.asarray(lib.get_sim_tlm(4)))
    nt2 = (nlev_t / 60. / 180. * np.pi) ** 2
    expect = transf ** 2 * cls['tt'][:lmax + 1] + nt2
    cl = np.zeros(lmax + 1)
    nmc = 16
    for i in range(nmc):
        cl += np.asarray(ualm.alm2cl(lib.get_sim_tlm(i), lmax)) / nmc
    sel = slice(5, lmax)
    assert np.allclose(cl[sel], expect[sel], rtol=0.25)
    t, e, b = lib.get_sim_teblm_batch(np.arange(3))
    assert t.shape == (3, ualm.getsize(lmax))


def test_projectmap():
    """Flat projection of a smooth ring map reproduces the underlying function."""
    import numpy as np
    from plancklens_tpu.ops.sht import gl_geometry
    from plancklens_tpu.utils.maps import projectmap
    geom = gl_geometry(128)
    th = geom.theta[:, None]
    ph = (2. * np.pi * np.arange(geom.nphi) / geom.nphi)[None, :]
    rmap = np.cos(th) + 0.3 * np.sin(th) * np.cos(ph)
    npts, lcell = 33, 30.  # odd: centre pixel lies exactly on the patch centre
    out = projectmap(rmap, geom, lcell, npts, lon_lat=(0., -45.))
    assert out.shape == (npts, npts)
    # centre value equals the function at the patch centre (theta = 135 deg, phi = 0)
    th0 = 135. / 180. * np.pi
    expect = np.cos(th0) + 0.3 * np.sin(th0)
    assert abs(out[npts // 2, npts // 2] - expect) < 1e-3
    assert np.all(np.isfinite(out))


def test_stopwatch_mask_hash_cls2dls_parity_helpers():
    """The small reference-parity helpers: qcinv/util.py stopwatch + mask_hash and
    nhl.py cls2dls/dls2cls interchange (reference: plancklens/qcinv/util.py:21-36,
    81-95; plancklens/nhl.py:191-214)."""
    import numpy as np
    from plancklens_tpu.utils import stopwatch
    from plancklens_tpu.utils.maps import mask_hash
    from plancklens_tpu.utils.cls import cls2dls, dls2cls

    sw = stopwatch()
    tot, lap = sw.lap()
    assert tot.count(':') == 2 and lap.count(':') == 2
    assert sw.elapsed().count(':') == 2

    assert mask_hash(None) == 'none'
    assert mask_hash('maps/mask.fits.gz') == 'maps_sl_mask_fits_gz'
    assert mask_hash(lambda: 1) == 'callable'
    a, b = np.ones(16), np.zeros(16)
    assert mask_hash(a) != mask_hash(b)
    assert mask_hash([a, 'x.y']) == mask_hash(a) + 'x_y'

    cls = {'tt': np.arange(1, 12.), 'te': -np.ones(11), 'pp': np.ones(11)}
    dls, cldd = cls2dls(cls)
    assert dls.shape == (11, 4)
    back = dls2cls(dls)
    assert np.allclose(back['tt'][1:], cls['tt'][1:]) and np.allclose(back['ee'], 0.)
    assert np.allclose(back['te'][1:], -1.)
    ls = np.arange(11.)
    assert np.allclose(cldd, (ls * (ls + 1.)) ** 2 / (2. * np.pi))
    assert cls2dls({'tt': np.ones(4)})[1] is None  # no pp -> no deflection spectrum
