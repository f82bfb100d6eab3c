"""Golden-value anchors for the joint-TP N1 kernel (n1L_jtp).

Independent continuum quadrature of the general-pairing Eq. A.3 integral
(tests/n1_continuum_integrator.n1_jtp_continuum — no shared code or gridding with the
kernel; converged to < 3e-4 between resolutions), with TE-coupled filter-matrix elements
wired through the primed-field slots. This demonstrates the joint-filtering path — the
coupling keys k13/k24/k14/k23 take genuinely asymmetric values (pte/pet) and the four
filter slots carry distinct (tt-like and te-like) arrays — against the paper's formula,
not against another transcription of the Fortran.

The (e, t, *, *)-style combinations whose totals are ~2% residuals of cancelling outer
contributions (measured cancellation factor ~45) are not anchored: there the kernel's
integer-snapped spectra move the residual by tens of percent while both quadratures agree
pointwise; the anchored combinations have O(1) conditioning.
"""
import numpy as np
import pytest

from plancklens_tpu.ops.n1kern import n1L_jtp

LMAX = 60
LPMAX = 120


def _cltt(l):
    return 1. / (l * (l + 1.) + 1.)


def _clee(l):
    return 0.3 / (l * (l + 1.) + 1.)


def _clte(l):
    return 0.15 / (l * (l + 1.) + 1.)


def _clpp(l):
    return 1e-2 * np.exp(-0.5 * ((l - 30.) / 30.) ** 2) / (l * (l + 1.) + 1.)


def _Ftt(l):
    win = 0.25 * (1. + np.tanh((l - 8.) / 3.)) * (1. - np.tanh((l - 52.) / 3.))
    return win / (_cltt(np.maximum(l, 1e-3)) + 2e-4)


def _Fte(l):
    win = 0.25 * (1. + np.tanh((l - 8.) / 3.)) * (1. - np.tanh((l - 52.) / 3.))
    return 0.4 * win / (_cltt(np.maximum(l, 1e-3)) + 5e-4)


# ((Xp, Yp, Ip, Jp), continuum value, rtol): all at L = 30, kA = kB = 'ptt', kI = 'p'
ANCHORS = [
    (('e', 'e', 'e', 'e'), 3.84716921e+05, 0.04),   # all couplings 'pee', all slots fte
    (('t', 't', 'e', 'e'), 1.82256399e+06, 0.05),   # all couplings 'pte', A slots tt, B te
    (('e', 'e', 'e', 't'), 7.46660840e+04, 0.15),   # pee/pet mix, three te + one tt slot
]


@pytest.mark.parametrize('combo,expect,rtol', ANCHORS)
def test_n1_jtp_matches_independent_quadrature(combo, expect, rtol):
    Xp, Yp, Ip, Jp = combo
    ls = np.arange(1, LMAX + 1, dtype=float)
    lp = np.arange(1, LPMAX + 1, dtype=float)
    fmap = {'t': _Ftt(ls), 'e': _Fte(ls)}
    val = float(n1L_jtp(30., 'ptt', 'ptt', Xp, Yp, Ip, Jp, 'p', _clpp(lp),
                        _cltt(ls), _clte(ls), _clee(ls),
                        _cltt(ls), _clte(ls), _clee(ls),
                        fmap[Xp], fmap[Yp], fmap[Ip], fmap[Jp],
                        lminA=1, lminB=1, dL=2, lps=np.arange(1, LPMAX + 1)))
    assert np.isfinite(val)
    assert abs(val / expect - 1.) < rtol, (combo, val, expect, val / expect - 1.)
