r"""Sky lensing (deflection remapping) operator.

Role of lenspyx's alm2lenmap(_spin) in the reference simulations (reference:
plancklens/sims/cmbs.py:104-233): lensed fields are the unlensed fields evaluated at the
geodesically-deflected positions n' = exp_n(d), d = grad phi, with spin fields additionally
rotated by the parallel-transport angle.

TPU-native design: the unlensed field is synthesised once on an oversampled equidistant
(theta, phi) grid (one batched SHT + FFT), and the deflected evaluation is separable
high-order Lagrange interpolation — a fixed (order+1)^2 gather-and-FMA stencil per output
pixel, fully vectorised/batched, instead of lenspyx's per-ring C++ interpolator. Deflected
positions and the spin rotation angle are computed with exact 3-vector geodesic algebra
(no small-angle expansions).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..utils import alm as ualm
from .sht import SHT, RingGeometry, good_fft_size


def ecp_rings(ntheta):
    """Midpoint equidistant colatitude rows (no rows at the poles)."""
    return (np.arange(ntheta) + 0.5) * np.pi / ntheta


def _ecp_geom(lmax, oversample):
    nth = int(np.ceil(oversample * (lmax + 1)))
    # nphi must be EVEN: the pole folding in _interp2d implements the phi + pi
    # half-turn as an integer shift by nphi//2 columns, which is exact only then
    # (good_fft_size alone returns odd 3^b 5^c sizes for ~10% of lmax values)
    nphi = good_fft_size(int(np.ceil(oversample * (2 * lmax + 1))))
    while nphi % 2:
        nphi = good_fft_size(nphi + 1)
    th = ecp_rings(nth)
    return RingGeometry('ecp_lens_%d_%d' % (nth, nphi), th, np.zeros(nth), nphi)


def _lagrange_weights(frac, order):
    """(npts, order+1) separable Lagrange weights at fractional offsets in [0, 1)."""
    # stencil nodes at integer offsets -(order//2) .. order - order//2
    offs = np.arange(order + 1) - order // 2
    def basis(x):
        w = []
        for i, oi in enumerate(offs):
            num = jnp.ones_like(x)
            den = 1.
            for j, oj in enumerate(offs):
                if i == j:
                    continue
                num = num * (x - oj)
                den = den * (oi - oj)
            w.append(num / den)
        return jnp.stack(w, axis=-1)
    return basis(frac), offs


@partial(jax.jit, static_argnums=(3,))
def _interp2d(fmaps, theta_t, phi_t, order, th0, dth, spin_sign):
    """Separable Lagrange interpolation of (batch, nth, nphi) maps at target positions.

    theta rows at th0 + i*dth; phi columns at 2 pi k / nphi (nphi = fmaps.shape[-1],
    must be even). Out-of-range theta rows (pole crossing) are folded back via
    f(-theta, phi+pi) = spin_sign * f(theta, phi), with the half turn applied as an
    nphi//2 column shift.
    """
    batch, nth, nphi = fmaps.shape
    x = (theta_t - th0) / dth           # fractional row index
    y = phi_t * nphi / (2. * np.pi)     # fractional column index
    i0 = jnp.floor(x).astype(jnp.int32)
    j0 = jnp.floor(y).astype(jnp.int32)
    wx, offs = _lagrange_weights(x - i0, order)
    wy, _ = _lagrange_weights(y - j0, order)
    out = jnp.zeros((batch,) + theta_t.shape, dtype=fmaps.dtype)
    for a, oa in enumerate(offs):
        row = i0 + int(oa)
        # pole folding: row < 0 -> -(row+1) with phi + pi; row >= nth -> 2 nth - 1 - row
        below = row < 0
        above = row >= nth
        row_f = jnp.where(below, -(row + 1), jnp.where(above, 2 * nth - 1 - row, row))
        shift = jnp.where(below | above, nphi // 2, 0)
        sgn = jnp.where(below | above, spin_sign, 1.).astype(fmaps.dtype)
        for b, ob in enumerate(offs):
            col = jnp.mod(j0 + int(ob) + shift, nphi)
            vals = fmaps[:, row_f, col]
            out = out + vals * (wx[..., a] * wy[..., b])[None] * sgn[None]
    return out


def deflection_field(plm, lmax_p, geom, sht=None, olm=None):
    """(d_theta, d_phi) deflection components on the geometry's pixels from the lensing
    potential (and optional curl potential) alms: d = eth phi (+ curl part)."""
    if sht is None:
        sht = SHT(geom, lmax_p)
    ls = np.arange(lmax_p + 1, dtype=float)
    fl = -np.sqrt(ls * (ls + 1.))
    glm = ualm.almxfl(jnp.asarray(plm), lmax_p, jnp.asarray(fl))
    clm = jnp.zeros_like(glm) if olm is None \
        else ualm.almxfl(jnp.asarray(olm), lmax_p, jnp.asarray(fl))
    red, imd = sht.alm2map_spin((glm, clm), 1)
    return red, imd


def _deflect(theta, phi, red, imd):
    """Exact geodesic displacement by the deflection vector (red e_theta + imd e_phi),
    plus the parallel-transport rotation angle gamma of the local basis."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    n = jnp.stack([st * cp, st * sp, ct], axis=-1)
    eth = jnp.stack([ct * cp, ct * sp, -st], axis=-1)
    eph = jnp.stack([-sp, cp, jnp.zeros_like(sp)], axis=-1)
    alpha = jnp.sqrt(red ** 2 + imd ** 2)
    alpha = jnp.maximum(alpha, 1e-30)
    that = (red[..., None] * eth + imd[..., None] * eph) / alpha[..., None]
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    npr = ca[..., None] * n + sa[..., None] * that
    thp = jnp.arccos(jnp.clip(npr[..., 2], -1., 1.))
    php = jnp.mod(jnp.arctan2(npr[..., 1], npr[..., 0]), 2. * np.pi)
    # parallel transport of e_theta along the geodesic: v' = v - (v.t)(sa n + (1-ca) t)
    vdott = (eth * that).sum(-1)
    vpr = eth - vdott[..., None] * (sa[..., None] * n + (1. - ca)[..., None] * that)
    stp = jnp.sin(thp)
    stp = jnp.where(stp < 1e-12, 1e-12, stp)
    ethp = jnp.stack([npr[..., 2] * jnp.cos(php), npr[..., 2] * jnp.sin(php), -stp],
                     axis=-1)
    ephp = jnp.stack([-jnp.sin(php), jnp.cos(php), jnp.zeros_like(php)], axis=-1)
    cosg = (vpr * ethp).sum(-1)
    sing = (vpr * ephp).sum(-1)
    gamma = jnp.arctan2(sing, cosg)
    return thp, php, gamma


class Lensing:
    """Deflection-remapping operator bound to an output geometry.

    Args:
        geom: output RingGeometry (e.g. the GL grid of the map simulations)
        lmax_unl: band limit of the unlensed skies
        lmax_p: band limit of the lensing potential
        oversample: ECP source-grid oversampling factor
        order: Lagrange interpolation order (odd; (order+1)^2-point stencil)
    """

    def __init__(self, geom, lmax_unl, lmax_p=None, oversample=4.0, order=9):
        self.geom = geom
        self.lmax_unl = lmax_unl
        self.lmax_p = lmax_unl if lmax_p is None else lmax_p
        self.src = _ecp_geom(lmax_unl, oversample)
        self.sht_src = SHT(self.src, lmax_unl)
        self.sht_p = SHT(geom, self.lmax_p)
        self.order = order
        th = self.src.theta
        self._th0 = float(th[0])
        self._dth = float(th[1] - th[0])
        tg = np.broadcast_to(geom.theta[:, None], (geom.nrings, geom.nphi))
        pg = np.broadcast_to(geom.phi0 + 2 * np.pi * np.arange(geom.nphi) / geom.nphi,
                             (geom.nrings, geom.nphi))
        self._theta_grid = jnp.asarray(tg)
        self._phi_grid = jnp.asarray(pg)

    def _positions(self, plm, olm=None):
        red, imd = deflection_field(plm, self.lmax_p, self.geom, sht=self.sht_p, olm=olm)
        return _deflect(self._theta_grid[None], self._phi_grid[None], red, imd)

    def alm2lenmap(self, tlm, plm, olm=None):
        """Lensed temperature map(s) on the output geometry; batched over leading dims."""
        tlm = jnp.atleast_2d(jnp.asarray(tlm))
        plm = jnp.atleast_2d(jnp.asarray(plm))
        thp, php, _ = self._positions(plm, olm=olm)
        tsrc = self.sht_src.alm2map(tlm)
        out = jnp.stack([_interp2d(tsrc[i:i + 1], thp[i], php[i], self.order,
                                   self._th0, self._dth, 1.)[0]
                         for i in range(tsrc.shape[0])])
        return out

    def alm2lenmap_spin(self, gclm, plm, spin=2, olm=None):
        """Lensed spin-s maps (e.g. Q, U from unlensed E, B alms), with exact
        parallel-transport rotation."""
        glm, clm = gclm
        glm = jnp.atleast_2d(jnp.asarray(glm))
        clm = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(clm)), glm.shape)
        plm = jnp.atleast_2d(jnp.asarray(plm))
        thp, php, gamma = self._positions(plm, olm=olm)
        q, u = self.sht_src.alm2map_spin((glm, clm), spin)
        p = q + 1j * u
        sgn = (-1.) ** spin  # pole-crossing parity of the spin-s field
        out = jnp.stack([_interp2d(p[i:i + 1], thp[i], php[i], self.order,
                                   self._th0, self._dth, sgn)[0]
                         for i in range(p.shape[0])])
        # components in the basis parallel-transported from n pick up e^{-is gamma}
        out = out * jnp.exp(-1j * spin * gamma)
        return out.real, out.imag
