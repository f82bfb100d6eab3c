"""Parameter files: import cleanly, data-independent pieces work, data-dependent
libraries fail lazily with an informative path (no external Planck products here)."""
import importlib.util
import os
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, 'params', name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_smica_parfile():
    par = _load('smica_dx12_planck2018')
    assert par.transf.shape == (par.lmax_ivf + 1,)
    assert np.all(np.isfinite(par.transf)) and 0. < par.transf[-1] < 1.
    assert np.all(np.isfinite(par.fal['tt'])) and par.fal['tt'][par.lmin_ivf - 1] == 0.
    # ss_dict mirrors the reference's roll-by-blocks-of-60 (qest.py analog lines 77-79)
    assert par.ss_dict[0] == 1 and par.ss_dict[59] == 0 and par.ss_dict[60] == 61
    assert all(v == -1 for v in par.ds_dict.values())
    with pytest.raises(FileNotFoundError):
        par.ivfs.get_sim_tlm(0)


def test_idealized_parfile():
    par = _load('idealized_example')
    assert hasattr(par, 'qlms_dd')


@pytest.mark.slow
def test_anisofilt_parfile_full_chain():
    # the whole masked pipeline, shrunk: lensed sims -> masked CG filter -> QE
    os.environ['PLK_ANISO_LMAX'] = '48'
    os.environ['PLK_ANISO_NSIMS'] = '10'
    try:
        par = _load('anisofilt_example')
    finally:
        del os.environ['PLK_ANISO_LMAX'], os.environ['PLK_ANISO_NSIMS']
    assert 0.5 < par.mask.mean() < 1.
    bt = np.asarray(par.ivfs.get_sim_tlm(0))
    assert np.all(np.isfinite(bt)) and np.abs(bt).max() > 0.
    q = np.asarray(par.qlms_dd.get_sim_qlm('ptt', 0))
    assert np.all(np.isfinite(q)) and np.abs(q).max() > 0.
