"""Gaussian reconstruction-noise levels per estimator key, from the low-level API.

Role of the reference's examples/plot_noiselevels.py: assemble N0 = N / R^2 for a chosen
anisotropy source directly from the two low-level building blocks — the Gaussian QE noise
(models/nhl.get_nhl) and the isotropic response (models/qresp.get_response) — for the
TT / pol-only / MV keys under separate-TP filtering, plus the GMV key under joint-TP
filtering.  The higher-level models/n0s.get_N0 wraps exactly this assembly; this script
is the under-the-hood view.

Pure-spectral, seconds on one core:
    python examples/plot_noiselevels.py                   # table on stdout
    python examples/plot_noiselevels.py --source f        # point-source amplitude
    python examples/plot_noiselevels.py --plot out.png    # save a figure
"""
# runnable from a bare source checkout
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import argparse
import os

import jax
# pure-spectral workload: pin the CPU backend (the default platform on a TPU-relay
# host would block at backend init) and enable f64 for the Wigner-d recursions
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np

import plancklens_tpu
from plancklens_tpu.utils import camb_clfile, cli, cl_inverse
from plancklens_tpu.models import nhl, qresp
from plancklens_tpu.models.n0s import gauss_beam


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--source', type=str, default='p', choices=['p', 'f', 'a', 'stt'],
                    help='anisotropy source (lensing gradient / modulation / '
                         'rotation / point sources)')
    ap.add_argument('--lmax', type=int, default=2048)
    ap.add_argument('--lmin', type=int, default=100)
    ap.add_argument('--beam', type=float, default=6., help='beam FWHM [arcmin]')
    ap.add_argument('--nlev-t', type=float, default=35., help='T noise [uK-arcmin]')
    ap.add_argument('--plot', type=str, default=None, metavar='FILE')
    args = ap.parse_args()

    ksource, lmax_ivf, lmin_ivf = args.source, args.lmax, args.lmin
    lmax_qlm = lmax_ivf
    nlev_t, nlev_p = args.nlev_t, args.nlev_t * np.sqrt(2.)

    if ksource in ('p', 'f', 'a'):
        qe_keys = [ksource + 'tt', ksource + '_p', ksource]
        key_labels = ['TT', 'P-only', 'MV']
    else:
        qe_keys, key_labels = [ksource], [ksource]

    cls_len = camb_clfile(os.path.join(plancklens_tpu.DATAPATH, 'cls',
                                       'FFP10_wdipole_lensedCls.dat'))
    cls_weight = cls_len
    transf = gauss_beam(args.beam, lmax_ivf)
    nt2 = (nlev_t / 60. / 180. * np.pi) ** 2 / transf ** 2
    np2 = (nlev_p / 60. / 180. * np.pi) ** 2 / transf ** 2

    # separate-TP filtering: diagonal isotropic filters, TE handled at the QE level
    fal_sep = {'tt': cli(cls_len['tt'][:lmax_ivf + 1] + nt2),
               'ee': cli(cls_len['ee'][:lmax_ivf + 1] + np2),
               'bb': cli(cls_len['bb'][:lmax_ivf + 1] + np2)}
    ivfs_sep = dict(fal_sep,
                    te=cls_len['te'][:lmax_ivf + 1] * fal_sep['tt'] * fal_sep['ee'])

    # joint-TP filtering: full 3x3 TEB inverse covariance (the GMV weighting)
    cls_dat = {'tt': cls_len['tt'][:lmax_ivf + 1] + nt2,
               'ee': cls_len['ee'][:lmax_ivf + 1] + np2,
               'bb': cls_len['bb'][:lmax_ivf + 1] + np2,
               'te': np.copy(cls_len['te'][:lmax_ivf + 1])}
    fal_jt = cl_inverse(cls_dat)
    ivfs_jt = cl_inverse(cls_dat)

    for cls in (fal_sep, ivfs_sep, fal_jt, ivfs_jt):
        for cl in cls.values():
            cl[:max(1, lmin_ivf)] *= 0.

    if ksource == 'p':
        w = lambda L: L ** 2 * (L + 1.) ** 2 * 1e7 / (2. * np.pi)
    else:
        w = lambda L: np.ones_like(np.asarray(L, dtype=float))

    curves = []   # (label, grad N0, curl N0 or None)
    for qe_key, lab in zip(qe_keys, key_labels):
        NG, NC, _, _ = nhl.get_nhl(qe_key, qe_key, cls_weight, ivfs_sep,
                                   lmax_ivf, lmax_ivf, lmax_out=lmax_qlm)
        RG, RC, _, _ = qresp.get_response(qe_key, lmax_ivf, ksource, cls_weight,
                                          cls_len, fal_sep, lmax_qlm=lmax_qlm)
        curl = cli(RC ** 2) * NC if qe_key[0] in ('p', 'x', 'f') else None
        curves.append((lab + ' (sep TP)', cli(RG ** 2) * NG, curl))
    if len(qe_keys) > 1:
        NG, NC, _, _ = nhl.get_nhl(ksource, ksource, cls_weight, ivfs_jt,
                                   lmax_ivf, lmax_ivf, lmax_out=lmax_qlm)
        RG, RC, _, _ = qresp.get_response(ksource, lmax_ivf, ksource, cls_weight,
                                          cls_len, fal_jt, lmax_qlm=lmax_qlm)
        curves.append(('GMV (joint TP)', cli(RG ** 2) * NG, cli(RC ** 2) * NC))

    Ls = np.array([L for L in (10, 30, 100, 300, 1000, 2000) if L <= lmax_qlm])
    print('# weighted N0(grad) for source %r  [w = L^2(L+1)^2 1e7/2pi for p, 1 else]'
          % ksource)
    print('# L     ' + ''.join('%16s' % lab for lab, _, _ in curves))
    for L in Ls:
        print('%-6d%s' % (L, ''.join('%16.4g' % (w(L) * n0[L]) for _, n0, _ in curves)))

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as pl
        ls = np.arange(2, lmax_qlm + 1)
        for lab, n0, curl in curves:
            ln = pl.loglog(ls, w(ls) * n0[ls], label=lab)
            if curl is not None:
                pl.loglog(ls, w(ls) * curl[ls], ls='--', c=ln[0].get_color())
        pl.xlabel(r'$L$')
        pl.ylabel(r'weighted $N_L^{(0)}$ (dashed: curl)')
        pl.legend()
        pl.savefig(args.plot, dpi=150, bbox_inches='tight')
        print('\nwrote %s' % args.plot)


if __name__ == '__main__':
    main()
