#!/usr/bin/env python
r"""Lensing reconstruction quickstart (reference analogue:
examples/lensingrec_quickstart.ipynb).

Generates lensed skies, filters them, reconstructs phi with the ptt QE, and checks the
normalised reconstruction against the input: the cross-spectrum over the response should
track C_L^pp, and the auto-spectrum should sit at C_L^pp + N0.

Run (CPU, a few minutes):   python examples/lensingrec_quickstart.py
"""

# runnable from a source checkout without installation
import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
import os
import numpy as np


def main(lmax=128, nsims=4, nlev_t=5.):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import plancklens_tpu
    from plancklens_tpu.utils import camb_clfile, cli, alm as ualm
    from plancklens_tpu.ops.sht import SHT, gl_geometry
    from plancklens_tpu.ops.lensing import Lensing
    from plancklens_tpu.models import qresp, nhl
    from plancklens_tpu.models.qest import eval_qe

    cls_path = os.path.join(plancklens_tpu.DATAPATH, 'cls')
    cls_len = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lensedCls.dat'), lmax=lmax)
    unl = camb_clfile(os.path.join(cls_path, 'FFP10_wdipole_lenspotentialCls.dat'),
                      lmax=lmax)
    geom = gl_geometry(lmax + 32)
    lens = Lensing(geom, lmax, lmax_p=lmax)
    sht = SHT(geom, lmax)
    nt2 = (nlev_t / 60. / 180. * np.pi) ** 2
    ftl = cli(cls_len['tt'] + nt2)
    ftl[:8] = 0.
    ls, ms = ualm._lm_indices(lmax)

    def ralm(cl, seed):
        rng = np.random.RandomState(seed)
        a = (rng.standard_normal(len(ls)) + 1j * rng.standard_normal(len(ls))) / np.sqrt(2.)
        a[ms == 0] = a[ms == 0].real * np.sqrt(2.)
        return a * np.sqrt(cl[ls])

    print('generating + lensing %d sims at lmax=%d ...' % (nsims, lmax))
    tunl = np.stack([ralm(unl['tt'], 3 * i) for i in range(nsims)])
    plms = np.stack([ralm(unl['pp'], 3 * i + 1) for i in range(nsims)])
    tmaps = np.asarray(lens.alm2lenmap(tunl, plms))
    tobs = np.asarray(sht.map2alm(tmaps))
    tobs = tobs + np.stack([ralm(np.full(lmax + 1, nt2), 3 * i + 2) for i in range(nsims)])

    print('filtering + reconstructing (ptt QE) ...')
    bart = np.asarray(ualm.almxfl(tobs, lmax, ftl))
    Z = np.zeros_like(bart)
    qlm, _ = eval_qe('ptt', lmax, cls_len,
                     lambda f, b=bart, z=Z: {'t': b, 'e': z, 'b': z}[f], lmax)
    qlm = np.asarray(qlm)

    RG = qresp.get_response('ptt', lmax, 'p', cls_len, cls_len,
                            {'tt': ftl, 'ee': 0 * ftl, 'bb': 0 * ftl}, lmax_qlm=lmax)[0]
    NG = nhl.get_nhl('ptt', 'ptt', cls_len, {'tt': ftl * (cls_len['tt'] + nt2) * ftl},
                     lmax, lmax, lmax_out=lmax)[0]
    N0 = NG * cli(RG ** 2)

    phat = np.asarray(ualm.almxfl(qlm, lmax, cli(RG)))  # normalised reconstruction
    cross = np.asarray(ualm.alm2cl(phat, lmax, alm2=plms)).mean(axis=0)
    auto = np.asarray(ualm.alm2cl(phat, lmax)).mean(axis=0)
    cpp_in = np.asarray(ualm.alm2cl(plms, lmax)).mean(axis=0)

    sel = slice(10, lmax - 20)
    # expected scatter of the band-averaged cross ratio: per-mode noise is ~N0/Cpp
    nmodes = nsims * np.sum(2 * np.arange(sel.start, sel.stop) + 1.)
    sig = np.sqrt(np.mean(N0[sel] / unl['pp'][sel.start:sel.stop]) / nmodes)
    print('\n  L-band averages over L in [%d, %d):' % (sel.start, sel.stop))
    print('  <phihat x phi_in> / <phi_in^2>          = %.3f  (expect 1 +- %.2f at this '
          'lmax/nsims)' % (np.mean(cross[sel] / cpp_in[sel]), sig))
    print('  <phihat^2> / (C_pp + N0)                = %.3f  (expect ~1)'
          % np.mean(auto[sel] / (unl['pp'][sel.start:sel.stop] + N0[sel])))
    print('  N0 / C_pp at L=40                       = %.2f' % (N0[40] / unl['pp'][40]))
    return cross, auto, N0


if __name__ == '__main__':
    main()
