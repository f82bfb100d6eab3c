"""Regression tests for the round-4 utils/parallel/examples review findings:
the ShardedIVFS hasattr batch contract, QE/qcl batch write-through caching,
the explicit-mmax getlmax inversion, gzipped-FITS ingestion, TPU-pod process
counting, and the idealized parfile's hashable ds/ss maps."""
import gzip
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plancklens_tpu.utils import alm as ualm

LMAX = 8
CLS = {k: np.ones(LMAX + 1) for k in ('tt', 'ee', 'bb', 'te')}


def _alm(idx, seed_off=0):
    rng = np.random.RandomState(300 + idx + seed_off)
    n = ualm.getsize(LMAX)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(complex)


class _PerIndexIVFS:
    """Filtering library exposing only the per-index interface (a cinv chain's shape)."""

    def get_sim_tlm(self, idx):
        return jnp.asarray(_alm(idx, 0))

    def get_sim_elm(self, idx):
        return jnp.asarray(_alm(idx, 50))

    def get_sim_blm(self, idx):
        return jnp.asarray(_alm(idx, 90))

    def get_ftl(self):
        return np.ones(LMAX + 1)

    def get_fel(self):
        return np.ones(LMAX + 1)

    def get_fbl(self):
        return np.ones(LMAX + 1)

    def hashdict(self):
        return {'fake': 'per-index'}


class _BatchIVFS(_PerIndexIVFS):
    def get_sim_teblm_batch(self, idxs):
        idxs = np.atleast_1d(idxs)
        return (jnp.stack([jnp.asarray(_alm(int(i), 0)) for i in idxs]),
                jnp.stack([jnp.asarray(_alm(int(i), 50)) for i in idxs]),
                jnp.stack([jnp.asarray(_alm(int(i), 90)) for i in idxs]))


def _mesh1():
    from plancklens_tpu.parallel.mesh import make_mesh
    return make_mesh(n_sims=1, devices=jax.devices('cpu')[:1])


def test_sharded_ivfs_preserves_batch_interface_contract():
    """hasattr(wrapper, 'get_sim_teblm_batch') must mirror the wrapped library —
    drivers use it to choose batch vs per-index paths (examples/run_qlms.py)."""
    from plancklens_tpu.parallel.mesh import ShardedIVFS
    mesh = _mesh1()
    per_index = ShardedIVFS(_PerIndexIVFS(), mesh)
    assert not hasattr(per_index, 'get_sim_teblm_batch')
    batched = ShardedIVFS(_BatchIVFS(), mesh)
    assert hasattr(batched, 'get_sim_teblm_batch')
    t, e, b = batched.get_sim_teblm_batch(np.arange(2))
    ref_t, _, _ = _BatchIVFS().get_sim_teblm_batch(np.arange(2))
    assert np.allclose(np.asarray(t), np.asarray(ref_t))
    # non-batch attributes still proxy through
    assert np.allclose(np.asarray(per_index.get_sim_tlm(0)), np.asarray(_alm(0, 0)))


def test_qlm_batch_write_through_feeds_scalar_and_second_batch():
    """get_sim_qlm_batch must populate the same per-index cache entries the scalar
    accessor uses; a second batch over the same indices must not re-evaluate."""
    from plancklens_tpu.models.qest import QELib
    ivfs = _BatchIVFS()
    qlib = QELib(ivfs, ivfs, CLS, LMAX, LMAX)
    idxs = np.arange(3)
    batch = np.asarray(qlib.get_sim_qlm_batch('ptt', idxs))
    for j, i in enumerate(idxs):
        assert qlib.cacher.is_cached('qlm%s_ptt_%04d' % (qlib._ctag, i))
        scalar = np.asarray(qlib.get_sim_qlm('ptt', int(i)))
        assert np.allclose(scalar, batch[j], rtol=1e-12, atol=1e-12)
    calls = {'n': 0}
    orig = qlib._eval_key

    def counting(*a, **kw):
        calls['n'] += 1
        return orig(*a, **kw)
    qlib._eval_key = counting
    again = np.asarray(qlib.get_sim_qlm_batch('ptt', idxs))
    assert calls['n'] == 0  # served from cache
    assert np.allclose(again, batch, rtol=1e-12, atol=1e-12)
    # curl rows were written too (scalar x-access is now free)
    assert qlib.cacher.is_cached('qlm%s_xtt_%04d' % (qlib._ctag, 0))


def test_qcl_batch_write_through_feeds_scalar():
    from plancklens_tpu.models.qest import QELib
    from plancklens_tpu.models.qecl import QeClLib
    ivfs = _BatchIVFS()
    qlib = QELib(ivfs, ivfs, CLS, LMAX, LMAX)
    qcl = QeClLib(qlib, qlib, np.array([], dtype=int))
    idxs = np.arange(2)
    batch = qcl.get_sim_qcl_batch('ptt', idxs)
    for j, i in enumerate(idxs):
        assert qcl.cacher.is_cached('qcl_ptt_ptt_%04d_%04d' % (i, i))
        assert np.allclose(qcl.get_sim_qcl('ptt', int(i)), batch[j],
                           rtol=1e-12, atol=1e-12)
    # second batch call: pure cache stack
    qcl.qeA = None  # would crash if the batch path recomputed
    assert np.allclose(qcl.get_sim_qcl_batch('ptt', idxs), batch)


def test_getlmax_explicit_mmax_roundtrip():
    for lmax, mmax in [(10, 10), (100, 50), (64, 3), (5, 0)]:
        size = ualm.getsize(lmax, mmax)
        assert ualm.getlmax(size, mmax) == lmax, (lmax, mmax)
    assert ualm.getlmax(ualm.getsize(100, 50) + 1, 50) == -1  # non-integral: flagged


def test_read_map_handles_gzipped_fits(tmp_path):
    from plancklens_tpu.utils import fitsio, maps
    nside = 4
    m = np.arange(12 * nside ** 2, dtype=float)
    path = str(tmp_path / 'mask.fits')
    fitsio.write_map(path, m)
    gzpath = str(tmp_path / 'mask.fits.gz')
    with open(path, 'rb') as f, gzip.open(gzpath, 'wb') as g:
        g.write(f.read())
    assert np.allclose(fitsio.read_map(gzpath), m)
    assert np.allclose(maps.read_map(gzpath), m)


def test_env_nproc_counts_tpu_pod_hosts(monkeypatch):
    from plancklens_tpu.parallel import distributed
    for v in ('SLURM_NTASKS', 'OMPI_COMM_WORLD_SIZE', 'TPU_WORKER_HOSTNAMES'):
        monkeypatch.delenv(v, raising=False)
    assert distributed._env_nproc() == 1
    monkeypatch.setenv('TPU_WORKER_HOSTNAMES', 'host0,host1,host2,host3')
    assert distributed._env_nproc() == 4


def test_idealized_parfile_ds_ss_maps_are_hashable():
    """ds/ss pairings must reach IVFShuffle.hashdict (dicts, not callables), so the
    qlms_ds/qlms_ss libraries are distinguishable to hash_check."""
    import importlib
    import params.idealized_example as par
    importlib.reload(par)
    h_d = par.ivfs_d.hashdict()
    h_s = par.ivfs_s.hashdict()
    assert 'map' in h_d and 'map' in h_s and h_d != h_s
