"""Pure-numpy FITS IO: healpy-format alm/map/cl files round-trip, NESTED ingestion.

The nside=1 (identity) and nside=2 (first ring = nested face corners 3,7,11,15)
ring/nest checks pin the permutation to healpy's documented pixelisation."""
import os
import numpy as np

from plancklens_tpu.utils import fitsio as fio
from plancklens_tpu.utils import alm as ualm


def test_ring2nest_known_values():
    assert np.array_equal(fio._ring2nest_index(1), np.arange(12))
    o2 = fio._ring2nest_index(2)
    assert sorted(o2.tolist()) == list(range(48))
    assert o2[:4].tolist() == [3, 7, 11, 15]


def test_alm_roundtrip(tmp_path):
    lmax = 32
    ls, ms = ualm._lm_indices(lmax)
    rng = np.random.RandomState(0)
    a = rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))
    a[ms == 0] = a[ms == 0].real
    fn = os.path.join(str(tmp_path), 'alm.fits')
    fio.write_alm(fn, a)
    assert np.allclose(fio.read_alm(fn), a)


def test_map_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    fn = os.path.join(str(tmp_path), 'map.fits')
    m = rng.standard_normal(12 * 16 ** 2)
    fio.write_map(fn, m, nside=16)
    assert np.allclose(fio.read_map(fn), m)
    mm = rng.standard_normal((3, 12 * 8 ** 2))
    fio.write_map(fn, mm, nside=8)
    for i in range(3):
        assert np.allclose(fio.read_map(fn, field=i), mm[i])


def test_nested_map_ingestion(tmp_path):
    # write a NESTED-ordered file by permuting a ring map, check read_map undoes it
    nside = 4
    rng = np.random.RandomState(2)
    m_ring = rng.standard_normal(12 * nside ** 2)
    perm = fio._ring2nest_index(nside)          # m_ring = m_nest[perm]
    m_nest = np.empty_like(m_ring)
    m_nest[perm] = m_ring
    fn = os.path.join(str(tmp_path), 'nest.fits')
    cards = [fio._card('PIXTYPE', 'HEALPIX'), fio._card('ORDERING', 'NESTED'),
             fio._card('NSIDE', nside)]
    fio.write_bintable(fn, [('TEMPERATURE', m_nest.reshape(-1, 8))], extra_cards=cards)
    assert np.allclose(fio.read_map(fn), m_ring)


def test_cl_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    fn = os.path.join(str(tmp_path), 'cl.fits')
    cls = rng.standard_normal((4, 100))
    fio.write_cl(fn, cls)
    assert np.allclose(fio.read_cl(fn), cls)
    one = rng.standard_normal(64)
    fio.write_cl(fn, one)
    assert np.allclose(fio.read_cl(fn), one)
