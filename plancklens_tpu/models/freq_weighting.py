r"""Expected pixel-variance maps from per-frequency variance maps and l-weights.

Planck 2018 lensing paper Eqs. 16-17: the variance map of a frequency-weighted map is the
sum of the input variance maps convolved with the Legendre coefficients of the *squared*
weight correlation functions (reference: plancklens/freq_weighting.py:13-79). Runs on any
ring geometry with the TPU SHT instead of healpy.
"""
import numpy as np

from ..ops.wigner import wignerpos, wignercoeff
from ..ops.gauleg import gauleg
from ..ops.sht import SHT


def w2wsq(wl, s1, s2, lmax_out):
    """Legendre coefficients of the squared Wigner correlation function of wl
    (reference: plancklens/freq_weighting.py:13-20)."""
    lmax = len(wl) - 1
    npts = (2 * lmax + lmax_out) // 2 + 1
    xg, wg = gauleg(npts)
    xi = np.asarray(wignerpos(np.asarray(wl, dtype=float), xg, s1, s2))
    return np.asarray(wignercoeff(xi ** 2 * wg, xg, 0, 0, lmax_out))


def vmaps2vmap_I(pix_vmaps, weights, geom, omega_pix=None):
    """Expected intensity pixel-variance map from per-frequency variance maps + weights.

    Args:
        pix_vmaps: list of (nrings, nphi) variance maps on `geom`
        weights: (nfreq, lmax+1) weights applied to the frequency noise maps
        geom: RingGeometry
        omega_pix: pixel solid angles (defaults to the geometry quadrature areas)
    """
    weights = np.atleast_2d(np.asarray(weights))
    nf, lmaxp1 = weights.shape
    # the squared correlation function carries power to 2 lmax; analysis is clamped to
    # the geometry's invertible band (the variance map holds no information beyond it)
    lmax_out = min(2 * lmaxp1 - 2, (geom.nphi - 1) // 2, geom.nrings - 1)
    if omega_pix is None:
        omega_pix = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sht = SHT(geom, lmax_out)
    ret_lm = 0.
    for vmap, wl in zip(pix_vmaps, weights):
        s2lm = np.asarray(sht.map2alm(np.asarray(vmap)))
        wl2 = w2wsq(wl, 0, 0, lmax_out)
        from ..utils import alm as ualm
        import jax.numpy as jnp
        ret_lm = ret_lm + np.asarray(ualm.almxfl(jnp.asarray(s2lm), lmax_out,
                                                 jnp.asarray(wl2 * np.mean(omega_pix))))
    return np.asarray(sht.alm2map(ret_lm))


def vmaps2vmap_P(pix_vmaps, weights_e, weights_b, geom, omega_pix=None):
    """Polarisation analogue: pix_vmaps are ~(s2_Q + s2_U)/2
    (reference: plancklens/freq_weighting.py:46-79)."""
    weights_e = np.atleast_2d(np.asarray(weights_e))
    weights_b = np.atleast_2d(np.asarray(weights_b))
    nf, lmaxp1 = weights_e.shape
    lmax_out = min(2 * max(lmaxp1, weights_b.shape[1]) - 2,
                   (geom.nphi - 1) // 2, geom.nrings - 1)
    if omega_pix is None:
        omega_pix = np.outer(geom.weight, np.full(geom.nphi, 2 * np.pi / geom.nphi))
    sht = SHT(geom, lmax_out)
    from ..utils import alm as ualm
    import jax.numpy as jnp
    ret_lm = 0.
    for vmap, wle, wlb in zip(pix_vmaps, weights_e, weights_b):
        s2lm = np.asarray(sht.map2alm(np.asarray(vmap)))
        wl2 = 0.25 * w2wsq(wle + wlb, 2, 2, lmax_out)
        wl2 += 0.25 * w2wsq(wle - wlb, 2, -2, lmax_out)
        ret_lm = ret_lm + np.asarray(ualm.almxfl(jnp.asarray(s2lm), lmax_out,
                                                 jnp.asarray(wl2 * np.mean(omega_pix))))
    return np.asarray(sht.alm2map(ret_lm))
