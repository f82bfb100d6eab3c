#!/usr/bin/env python
r"""Batch pipeline driver (reference analogue: examples/run_qlms.py).

The reference stripes simulation indices over MPI ranks and exchanges results through the
filesystem (reference: examples/run_qlms.py:48-118). Here each stage is one batched,
jittable program over the sims axis, shardable across a jax Mesh — no ranks, no barriers:

    python examples/run_qlms.py <parfile.py> -imin 0 -imax 63 -k p_p --stages filt,qe,mf,qcl

On a multi-device host, pass --mesh to shard the sims batch over devices.
"""
import argparse
import importlib.util
import os
import sys
import time

# runnable from a source checkout without installation (parfiles import plancklens_tpu)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def load_parfile(path):
    spec = importlib.util.spec_from_file_location('parfile', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('parfile', help='parameter file (python module path)')
    p.add_argument('-imin', type=int, default=0)
    p.add_argument('-imax', type=int, default=15)
    p.add_argument('-k', dest='keys', nargs='+', default=['ptt'],
                   help='QE keys to compute')
    p.add_argument('--stages', default='filt,qe,mf,qcl,nhl',
                   help='comma list of stages: filt, qe, mf, xin, qcl, nhl')
    p.add_argument('--mesh', action='store_true',
                   help='shard the sims batch over all devices')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (needed where env vars are pre-empted)')
    p.add_argument('--x64', action='store_true', help='enable float64')
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    if args.x64:
        jax.config.update('jax_enable_x64', True)
    par = load_parfile(args.parfile)
    idxs = np.arange(args.imin, args.imax + 1)
    stages = args.stages.split(',')

    if args.mesh:
        from plancklens_tpu.parallel import make_mesh
        from plancklens_tpu.parallel.mesh import ShardedIVFS
        mesh = make_mesh()
        print('mesh:', mesh)
        # shard every filtered batch over 'sims': the QE/qcl stages consume these arrays
        # inside jitted programs, which then run distributed
        wrapped = {}

        def _wrap(ivfs):
            if id(ivfs) not in wrapped:
                wrapped[id(ivfs)] = ShardedIVFS(ivfs, mesh)
            return wrapped[id(ivfs)]

        par.ivfs = _wrap(par.ivfs)
        for lib in (par.qlms_dd, getattr(par, 'qlms_ds', None),
                    getattr(par, 'qlms_ss', None)):
            if lib is not None:
                lib.ivfs1 = _wrap(lib.ivfs1)
                lib.ivfs2 = _wrap(lib.ivfs2)

    if 'filt' in stages:
        t0 = time.time()
        if hasattr(par.ivfs, 'get_sim_teblm_batch'):
            t, e, b = par.ivfs.get_sim_teblm_batch(idxs)
        else:   # per-index filters (cinv chains, IVFFtl views): same fallback as QELib
            t = [par.ivfs.get_sim_tlm(int(i)) for i in idxs]
            _ = [par.ivfs.get_sim_elm(int(i)) for i in idxs]
            _ = [par.ivfs.get_sim_blm(int(i)) for i in idxs]
        jax.block_until_ready(t)
        print('[filt] %d sims filtered in %.2fs' % (len(idxs), time.time() - t0))

    if 'qe' in stages:
        for k in args.keys:
            t0 = time.time()
            qlms = par.qlms_dd.get_sim_qlm_batch(k, idxs)
            jax.block_until_ready(qlms)
            print('[qe]   %s: %d sims in %.2fs' % (k, len(idxs), time.time() - t0))

    if 'mf' in stages:
        for k in args.keys:
            t0 = time.time()
            halves = [h for h in (par.mc_sims_mf_dd[0::2], par.mc_sims_mf_dd[1::2])
                      if len(h)]   # tiny-nsims configs can leave a half empty
            mfs = [par.qlms_dd.get_sim_qlm_mf(k, h) for h in halves]
            if mfs:
                jax.block_until_ready(mfs[-1])
            print('[mf]   %s: %d split-half mean fields in %.2fs'
                  % (k, len(mfs), time.time() - t0))

    if 'xin' in stages and hasattr(par, 'qlms_x_in'):
        # cross-spectra with the input lensing maps (reference stage 3,
        # run_qlms.py:78-86; optional exactly as there)
        for k in args.keys:
            t0 = time.time()
            for idx in idxs:
                par.qlms_x_in.get_sim_qcl(k, int(idx))
            print('[xin]  %s: %d crosses with input phi in %.2fs'
                  % (k, len(idxs), time.time() - t0))

    if 'qcl' in stages:
        for k in args.keys:
            t0 = time.time()
            for lib, name in [(par.qcls_dd, 'dd'), (par.qcls_ds, 'ds'),
                              (par.qcls_ss, 'ss')]:
                cls = lib.get_sim_qcl_batch(k, idxs)
                print('[qcl]  %s %s: %s in %.2fs' % (k, name, cls.shape, time.time() - t0))
                t0 = time.time()

    if 'nhl' in stages:
        for k in args.keys:
            t0 = time.time()
            nhl = par.nhl_dd.get_sim_nhl(int(idxs[0]), k, k)
            print('[nhl]  %s: semi-analytic N0 in %.2fs' % (k, time.time() - t0))

    print('done.')


if __name__ == '__main__':
    main()
