r"""Lensed CMB power spectra from unlensed spectra + C_L^phiphi.

Correlation-function method (Challinor & Lewis 2005, astro-ph/0502425): lensed correlation
functions are the unlensed ones smoothed by the Gaussian deflection dispersion sigma^2(beta)
(non-perturbatively) and convolved with the deflection correlation Cgl,2(beta) order by
order. All Wigner-d synthesis/analysis runs on the GL grid through the cached matmul
kernel (ops/wigner).

The reference delegates this operation to CAMB (reference: plancklens/nhl.py:217-397 calls
camb.correlations.lensed_cls for the iterative-N0 forecasts); camb is not available in this
environment, so this is a self-contained implementation, validated against the shipped
FFP10 lensed spectra.

Series kept: exact exp(-l(l+1) sigma^2/2) smoothing, Cgl,2 terms through second order in
the exponential ladder sum_k (l(l+1)/2 Cgl2)^k / k! d^l_{s1+k, s2-k}-type couplings.

Accuracy is set by the *input band limit*, not the Cgl,2 order: lensing moves power
across Delta-l of several hundred, so C_len(l) needs the unlensed input out to
l + O(500).  Measured against the FFP10 CAMB outputs (unlensed input to lmax 4000):
TT/EE/TE agree to a few 1e-4 and BB to 7e-5 for l <= 800 and <0.1% to l = 1600 at
nterms=2 (nterms=3 moves BB by <4e-6 relative — the series is converged).  With the
input truncated at lmax_out + 50 the BB error inflates to ~1.7%: always provide
input spectra >~500 multipoles beyond the highest output l you care about (the
default lmax_out enforces that margin).
"""
import numpy as np
from math import factorial as _factorial

from .gauleg import gauleg, nquad_for
from .wigner import wignerpos, wignercoeff


def lensed_cls(cls_unl, clpp, lmax_out=None, nterms=2, delta_cls=False):
    """Lensed TT/EE/BB/TE spectra.

    Args:
        cls_unl: dict with unlensed 'tt', 'ee', 'bb', 'te'
        clpp: lensing potential spectrum C_L^phiphi
        lmax_out: output band limit (defaults to input lmax - 500: the band-limit
            buffer that keeps BB sub-0.1% — see the module docstring; for inputs
            too short to afford it the default degrades to min(lmax - 50, 500);
            explicit lmax_out closer to the input lmax trades accuracy knowingly)
        nterms: order in Cgl,2 kept (2 recommended; 3 changes BB by <4e-6 relative)
        delta_cls: return the lensing-induced difference (lensed - unlensed) instead of
            the lensed spectra (camb.correlations.lensed_cls delta_cls convention)

    Returns:
        dict with lensed 'tt', 'ee', 'bb', 'te'.
    """
    lmax = len(cls_unl['tt']) - 1
    lmaxp = len(clpp) - 1
    if lmax_out is None:
        # the 500 buffer keeps BB sub-0.1% (module docstring); for short inputs where
        # that would leave no band at all, degrade gracefully to the minimal-buffer
        # default rather than return an l <= 1 stub
        lmax_out = max(lmax - 500, min(lmax - 50, 500), 1)
    npts = nquad_for(2 * max(lmax, lmaxp) + lmax_out)
    xg, wg = gauleg(npts)
    tok = ('gl', npts)
    ls = np.arange(lmax + 1, dtype=float)
    lp = np.arange(lmaxp + 1, dtype=float)

    # deflection correlation functions
    cdd = lp * (lp + 1.) * np.asarray(clpp)
    Cgl = np.asarray(wignerpos(cdd, xg, 1, 1, grid_token=tok))
    Cgl2 = np.asarray(wignerpos(cdd, xg, -1, 1, grid_token=tok))
    # sigma^2(beta) = Cgl(0) - Cgl(beta); Cgl(0) = sum (2l+1)/4pi l(l+1) Cpp
    sig2 = np.sum((2 * lp + 1) / (4 * np.pi) * cdd) - Cgl

    llp1 = ls * (ls + 1.)
    out = {}

    def _ladder(s, n_up, n_dn):
        """Path-ordered eigenvalue product for n_up raisings then n_dn lowerings from
        spin s (order-symmetric for the terms kept here)."""
        fac = np.ones_like(ls, dtype=float)
        cur = s
        for _ in range(n_up):
            fac *= np.sqrt(np.maximum((ls - cur) * (ls + cur + 1.), 0.))
            cur += 1
        for _ in range(n_dn):
            fac *= np.sqrt(np.maximum((ls + cur) * (ls - cur + 1.), 0.))
            cur -= 1
        return fac

    def series_pos(cl, s1, s2, smooth_expo):
        """Lensed correlation of a (s1, s2) spectral series: each power of Cgl,2 shifts
        the spins by (+1, -1) or (-1, +1); terms up to total order `nterms`."""
        xi = np.zeros_like(xg)
        for k in range(nterms + 1):
            xi_k = np.zeros_like(xg)
            for u in range(k + 1):
                v = k - u
                # u shifts (+1 on s1, -1 on s2), v shifts (-1 on s1, +1 on s2)
                lad = _ladder(s1, u, v) * _ladder(s2, v, u)
                coef = cl * lad / (4. ** k) / (_factorial(u) * _factorial(v))
                xi_k += _smoothed_synth(coef, smooth_expo, sig2, xg,
                                        s1 + u - v, s2 - u + v, tok)
            xi += (Cgl2 ** k) * xi_k
        return xi

    def _smoothed_synth(coef, expo_fac, sig2, xg, sa, sb, tok):
        """sum_l (2l+1)/4pi coef_l exp(-expo_l sig2(beta)/2) d^l_{sa sb}(beta).

        The beta-dependent exponential prevents a single synthesis; expand the
        exponential around sig2 -> exact treatment via per-beta evaluation in chunks of
        the GL grid is O(lmax x npts) = same cost as one Wigner matrix build.
        """
        from .wigner import wigner_dmat
        dm = np.asarray(wigner_dmat(len(coef) - 1, sa, sb, xg, grid_token=tok))
        fac = (2. * np.arange(len(coef)) + 1.) / (4. * np.pi)
        # (lmax+1, npts) exponential smoothing
        E = np.exp(-0.5 * expo_fac[:, None] * sig2[None, :])
        return np.einsum('l,lx,lx->x', coef * fac, E, dm)

    # TT
    out_tt_xi = series_pos(np.asarray(cls_unl['tt'])[:lmax + 1], 0, 0, llp1)
    out['tt'] = np.asarray(wignercoeff(out_tt_xi * wg, xg, 0, 0, lmax_out, grid_token=tok))

    # EE/BB via xi+ (spins (2,2), CE+CB) and xi- (spins (2,-2), CE-CB)
    ce = np.asarray(cls_unl['ee'])[:lmax + 1]
    cb = np.asarray(cls_unl.get('bb', np.zeros(lmax + 1)))[:lmax + 1]
    expo_p = llp1 - 4.  # exp factor for spin-2 correlations (CL05)
    xi_p = series_pos(ce + cb, 2, 2, expo_p)
    xi_m = series_pos(ce - cb, 2, -2, expo_p)
    clp = np.asarray(wignercoeff(xi_p * wg, xg, 2, 2, lmax_out, grid_token=tok))
    clm = np.asarray(wignercoeff(xi_m * wg, xg, 2, -2, lmax_out, grid_token=tok))
    out['ee'] = 0.5 * (clp + clm)
    out['bb'] = 0.5 * (clp - clm)

    # TE via xi_X (spins (2,0))
    te = np.asarray(cls_unl['te'])[:lmax + 1]
    expo_x = llp1 - 2.
    xi_x = series_pos(te, 2, 0, expo_x)
    out['te'] = np.asarray(wignercoeff(xi_x * wg, xg, 2, 0, lmax_out, grid_token=tok))
    if delta_cls:
        for k in out:
            unl = np.zeros(lmax_out + 1)
            cl_in = np.asarray(cls_unl.get(k, unl))
            n = min(len(cl_in), lmax_out + 1)
            unl[:n] = cl_in[:n]
            out[k] = out[k] - unl
    return out
