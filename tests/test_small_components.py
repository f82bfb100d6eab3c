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
