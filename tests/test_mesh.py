"""Multi-device mesh tests (8 virtual CPU devices, tests/conftest.py).

The reference distributes work by MPI rank striding over sim indices with filesystem
rendezvous (reference: plancklens/helpers/mpi.py:34-55, examples/run_qlms.py:57). Here
the sims axis is a sharded array dimension on a jax Mesh; these tests assert that the
sharded programs produce the single-device results and that the declared mesh axes
actually partition the data.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import plancklens_tpu
from plancklens_tpu.parallel import make_mesh, shard_batch, sims_sharding
from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
from plancklens_tpu.ops.sht import SHT, gl_geometry
from plancklens_tpu.ops.sht.core import legendre_synth
from plancklens_tpu.models.cinv import CinvT

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs the 8-virtual-device CPU platform')

LMAX = 32


def _cls(lmax=LMAX):
    return camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                    'FFP10_wdipole_lensedCls.dat'), lmax=lmax)


def _random_tlm_batch(cls, batch, lmax=LMAX, seed=0):
    rng = np.random.RandomState(seed)
    ls, ms = ualm._lm_indices(lmax)
    a = (rng.standard_normal((batch, len(ls)))
         + 1j * rng.standard_normal((batch, len(ls)))) / np.sqrt(2.)
    a[:, ms == 0] = a[:, ms == 0].real * np.sqrt(2.)
    return a * np.sqrt(cls['tt'][ls])[None, :]


def test_sharded_qe_batch_matches_unsharded():
    """The flagship QE step sharded over the 'sims' axis == single-device result."""
    import __graft_entry__ as ge
    step = ge._build_step(LMAX, LMAX)
    cls = _cls()
    tlm = _random_tlm_batch(cls, batch=8).astype(np.complex64)

    qlm_ref, cl_ref = jax.jit(step)(jnp.asarray(tlm))
    qlm_ref, cl_ref = np.asarray(qlm_ref), np.asarray(cl_ref)

    mesh = make_mesh(n_sims=8, n_m=1)
    with mesh:
        fn = jax.jit(step, in_shardings=sims_sharding(mesh, 2),
                     out_shardings=(sims_sharding(mesh, 2), sims_sharding(mesh, 2)))
        qlm_sh, cl_sh = fn(shard_batch(mesh, tlm))
    # each sim's QE is independent; sharded vs unsharded differ only by XLA
    # fusion/reduction order, at the f32 working precision of this step's engine
    # (measured ~1e-7 relative)
    assert np.abs(np.asarray(qlm_sh) - qlm_ref).max() <= 1e-6 * np.abs(qlm_ref).max()
    assert np.abs(np.asarray(cl_sh) - cl_ref).max() <= 1e-6 * np.abs(cl_ref).max()
    # and the output really is distributed: every device holds a 1-sim shard
    shards = qlm_sh.addressable_shards
    assert len(shards) == 8 and all(s.data.shape[0] == 1 for s in shards)


def test_sharded_ivfs_adapter_matches_and_distributes():
    """The ShardedIVFS adapter (the driver's --mesh mechanism) must leave QE batch
    results unchanged while actually distributing the filtered batches."""
    import os
    import importlib.util
    from plancklens_tpu.parallel.mesh import ShardedIVFS
    os.environ['PLK_LMAX_IVF'] = '32'
    os.environ['PLK_LMAX_QLM'] = '32'
    os.environ['PLK_NSIMS'] = '8'
    spec = importlib.util.spec_from_file_location(
        'parfile_mesh_test',
        os.path.join(os.path.dirname(__file__), '..', 'params', 'idealized_example.py'))
    par = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(par)
    idxs = np.arange(8)
    qlm_ref = np.asarray(par.qlms_dd.get_sim_qlm_batch('ptt', idxs))
    mesh = make_mesh(n_sims=8, n_m=1)
    with mesh:
        wrapped = ShardedIVFS(par.qlms_dd.ivfs1, mesh)
        t, e, b = wrapped.get_sim_teblm_batch(idxs)
        assert len(t.addressable_shards) == 8
        assert all(s.data.shape[0] == 1 for s in t.addressable_shards)
        par.qlms_dd.ivfs1 = wrapped
        par.qlms_dd.ivfs2 = wrapped
        qlm_sh = par.qlms_dd.get_sim_qlm_batch('ptt', idxs)
    assert np.abs(np.asarray(qlm_sh) - qlm_ref).max() <= 1e-10 * np.abs(qlm_ref).max()
    # interface passthrough
    assert np.all(wrapped.get_ftl() == par.qlms_dd.ivfs1.get_ftl())


@pytest.mark.slow
def test_sharded_cinv_batch_converges_and_matches():
    """A batched masked cinv solve sharded over 'sims' converges to the same solution."""
    cls = _cls()
    geom = gl_geometry(LMAX)
    sht = SHT(geom, LMAX)
    nlev = 30.
    omega = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sig_pix = (nlev / 60. / 180. * np.pi) / np.sqrt(omega)
    transf = np.exp(-0.5 * np.arange(LMAX + 1) * np.arange(1, LMAX + 2)
                    * (30. / 60. / 180. * np.pi / 2.355) ** 2)
    ninv = 1. / sig_pix ** 2
    ninv[geom.nrings // 2 - 1: geom.nrings // 2 + 2, :] = 0.  # masked band

    rng = np.random.RandomState(3)
    batch = 4
    tlm = _random_tlm_batch(cls, batch, seed=4)
    tmaps = np.asarray(sht.alm2map(ualm.almxfl(jnp.asarray(tlm), LMAX, transf)))
    tmaps = tmaps + rng.standard_normal(tmaps.shape) * sig_pix[None]

    cinv = CinvT(LMAX, geom, cls, transf, ninv, eps_min=1e-6, iter_max=400, lmax_dense=16)
    x_ref, it_ref, rel_ref = cinv.solve_wf(tmaps)
    assert np.all(np.asarray(rel_ref) < 1e-6)

    mesh = make_mesh(n_sims=4, n_m=2)
    with mesh:
        tmaps_sh = jax.device_put(tmaps, NamedSharding(mesh, P('sims', None, None)))
        x_sh, it_sh, rel_sh = cinv.solve_wf(tmaps_sh)
    assert np.all(np.asarray(rel_sh) < 1e-6)
    # CG trajectories diverge in rounding once sharding reorders reductions, so the two
    # solutions agree only to ~cond(A) x eps_min, not machine precision
    ref, num = np.asarray(x_ref), np.asarray(x_sh)
    err = np.abs(num - ref).max() / np.abs(ref).max()
    assert err < 1e-3, err


def test_m_axis_shard_partitions_legendre_phase():
    """The Legendre phase sharded over 'm' (the lmax-scaling axis) is correct and the
    compiled program really splits the m dimension across devices."""
    lmax = 63
    geom = gl_geometry(lmax)
    theta = geom.theta
    rng = np.random.RandomState(5)
    C = (rng.standard_normal((2, lmax + 1, lmax + 1))
         + 1j * rng.standard_normal((2, lmax + 1, lmax + 1)))
    # zero the upper triangle (m > l), as in a real alm table
    ls = np.arange(lmax + 1)[:, None]
    C *= (np.arange(lmax + 1)[None, :] <= ls)

    ref = np.asarray(legendre_synth(jnp.asarray(C), 0, theta, grid_token='mesh_t'))

    mesh = make_mesh(n_sims=4, n_m=2)
    m_shard = NamedSharding(mesh, P(None, None, 'm'))
    with mesh:
        fn = jax.jit(lambda c: legendre_synth(c, 0, theta, grid_token='mesh_t'),
                     in_shardings=m_shard, out_shardings=m_shard)
        out = fn(jax.device_put(C, m_shard))
    assert np.allclose(np.asarray(out), ref, rtol=0, atol=1e-12 * np.abs(ref).max())
    # every addressable shard holds half the m columns: the work is partitioned
    mdim = lmax + 1
    assert all(s.data.shape[-1] == mdim // 2 for s in out.addressable_shards)


def test_shard_batch_layout():
    """make_mesh/shard_batch place the leading sims axis across the 'sims' mesh axis."""
    mesh = make_mesh(n_sims=8, n_m=1)
    arr = np.arange(8 * 3, dtype=np.float64).reshape(8, 3)
    sharded = shard_batch(mesh, arr)
    assert np.array_equal(np.asarray(sharded), arr)
    for s in sharded.addressable_shards:
        assert s.data.shape == (1, 3)
        assert np.array_equal(np.asarray(s.data), arr[s.index])


def test_full_sht_roundtrip_sharded_both_phases():
    """Full alm2map/map2alm sharded over ('sims', 'm'): the Legendre phase partitions m
    columns, the FFT phase partitions rings (each shard FFTs whole rings), with the
    explicit all-to-all resharding between the phases — and the results match the
    unsharded transforms."""
    from plancklens_tpu.parallel import shard_sht
    lmax = 47
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    cls = _cls(lmax)
    tlm = _random_tlm_batch(cls, batch=4, lmax=lmax, seed=9)
    map_ref = np.asarray(sht.alm2map(jnp.asarray(tlm)))
    alm_ref = np.asarray(sht.map2alm(jnp.asarray(map_ref)))

    mesh = make_mesh(n_sims=4, n_m=2)
    from plancklens_tpu.parallel.mesh import maps_sharding
    with mesh:
        ssht = shard_sht(sht, mesh)
        synth = jax.jit(ssht.alm2map, in_shardings=sims_sharding(mesh, 2),
                        out_shardings=maps_sharding(mesh))
        anal = jax.jit(ssht.map2alm, in_shardings=maps_sharding(mesh),
                       out_shardings=sims_sharding(mesh, 2))
        m_sh = synth(shard_batch(mesh, tlm))
        a_sh = anal(m_sh)
        # FFT phase really is ring-partitioned: every shard holds a ring block
        nh = (geom.nrings + 1) // 2
        assert all(s.data.shape[1] in (nh, geom.nrings - nh)
                   for s in m_sh.addressable_shards)
        # the compiled synthesis contains the inter-phase all-to-all
        txt = synth.lower(shard_batch(mesh, tlm)).compile().as_text()
        assert 'all-to-all' in txt or 'all-to-all' in txt.replace('_', '-'), \
            'no all-to-all in the compiled sharded synthesis'
    assert np.allclose(np.asarray(m_sh), map_ref, atol=1e-11 * np.abs(map_ref).max())
    assert np.allclose(np.asarray(a_sh), alm_ref, atol=1e-11 * np.abs(alm_ref).max())

    # spin-2 round trip through the same sharded path (no l < 2 modes at spin 2)
    ls, _ = ualm._lm_indices(lmax)
    elm = _random_tlm_batch(cls, batch=4, lmax=lmax, seed=10) * (ls >= 2)
    blm = 0.1 * _random_tlm_batch(cls, batch=4, lmax=lmax, seed=11) * (ls >= 2)
    q_ref, u_ref = (np.asarray(x) for x in sht.alm2map_spin((jnp.asarray(elm),
                                                             jnp.asarray(blm)), 2))
    with mesh:
        ssht = shard_sht(sht, mesh)
        synth2 = jax.jit(lambda g, c: ssht.alm2map_spin((g, c), 2),
                         in_shardings=(sims_sharding(mesh, 2), sims_sharding(mesh, 2)),
                         out_shardings=(maps_sharding(mesh), maps_sharding(mesh)))
        q_sh, u_sh = synth2(shard_batch(mesh, elm), shard_batch(mesh, blm))
        anal2 = jax.jit(lambda q, u: ssht.map2alm_spin((q, u), 2),
                        in_shardings=(maps_sharding(mesh), maps_sharding(mesh)),
                        out_shardings=(sims_sharding(mesh, 2), sims_sharding(mesh, 2)))
        e_sh, b_sh = anal2(q_sh, u_sh)
    assert np.allclose(np.asarray(q_sh), q_ref, atol=1e-11 * np.abs(q_ref).max())
    assert np.allclose(np.asarray(e_sh), np.asarray(elm),
                       atol=1e-9 * np.abs(np.asarray(elm)).max())
    assert np.allclose(np.asarray(b_sh), np.asarray(blm),
                       atol=1e-9 * np.abs(np.asarray(elm)).max())


def test_sharded_sht_uneven_batch_falls_back():
    """A batch that does not divide the 'sims' mesh axis (e.g. the single data map)
    cannot enter the ring-local shard_map FFT path (shard_map has no padding); it must
    fall back to the sharding-constraint path and still match the unsharded result."""
    from plancklens_tpu.parallel import shard_sht
    lmax = 47
    geom = gl_geometry(lmax)
    sht = SHT(geom, lmax)
    cls = _cls(lmax)
    tlm = _random_tlm_batch(cls, batch=3, lmax=lmax, seed=13)   # 3 % 2 != 0
    map_ref = np.asarray(sht.alm2map(jnp.asarray(tlm)))
    mesh = make_mesh(n_sims=2, n_m=2, devices=jax.devices()[:4])
    with mesh:
        ssht = shard_sht(sht, mesh)
        assert not ssht._ring_local(3) and ssht._ring_local(4)
        m_sh = jax.jit(ssht.alm2map)(jnp.asarray(tlm))
        a_sh = jax.jit(ssht.map2alm)(m_sh)
    assert np.allclose(np.asarray(m_sh), map_ref, atol=1e-11 * np.abs(map_ref).max())
    assert np.allclose(np.asarray(a_sh), tlm, atol=1e-9 * np.abs(tlm).max())
