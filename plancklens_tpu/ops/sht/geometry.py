"""Iso-latitude ring geometries for spherical transforms.

The TPU-native pixelisation is the Gauss-Legendre grid: nrings = lmax+1 rings at GL nodes
(quadrature exact for band-limited maps), uniform nphi across rings (so the longitude phase
is one batched FFT) — unlike HEALPix where nphi varies per ring. This replaces the
reference's healpy/lenspyx backend role (reference: plancklens/shts.py:4-35); a HEALPix
geometry can be expressed in the same structure (per-ring theta/nphi/phi0/weight) for
compatibility.
"""
import numpy as np
from dataclasses import dataclass, field

from ..gauleg import gauleg


def good_fft_size(n):
    """Smallest 2^a 3^b 5^c >= n (efficient FFT length)."""
    best = 1 << int(np.ceil(np.log2(n)))
    p5 = 1
    while p5 < best:
        p3 = p5
        while p3 < best:
            p2 = p3
            while p2 < n:
                p2 *= 2
            if n <= p2 < best:
                best = p2
            p3 *= 3
        p5 *= 5
    return best


@dataclass(frozen=True)
class RingGeometry:
    """Iso-latitude pixelisation: maps are (..., nrings, nphi) arrays (uniform nphi)."""
    name: str
    theta: np.ndarray           # (nrings,) colatitudes
    weight: np.ndarray          # (nrings,) quadrature weights for integration dcos(theta)
    nphi: int                   # common number of longitudes
    phi0: float = 0.            # longitude of first pixel in each ring

    @property
    def nrings(self):
        return len(self.theta)

    @property
    def npix(self):
        return self.nrings * self.nphi

    @property
    def cost(self):
        return np.cos(self.theta)

    @property
    def sint(self):
        return np.sin(self.theta)

    def token(self):
        """Hashable identity for kernel-level caching."""
        return (self.name, self.nrings, self.nphi, float(self.phi0))

    def hashdict(self):
        return {'name': self.name, 'nrings': self.nrings, 'nphi': self.nphi,
                'phi0': self.phi0}


def gl_geometry(lmax, nphi=None):
    """Gauss-Legendre grid exact for products of band-limit-lmax fields:
    nrings = lmax + 1 nodes, nphi >= 2 lmax + 1 (rounded to an efficient FFT size)."""
    x, w = gauleg(lmax + 1)
    theta = np.arccos(x[::-1])  # north to south
    weight = w[::-1].copy()
    if nphi is None:
        nphi = good_fft_size(2 * lmax + 2)
    return RingGeometry('gl_%d' % lmax, theta, weight, int(nphi))


def ecp_geometry(nrings, nphi=None, lmax=None):
    """Equidistant-colatitude (midpoint, endpoints excluded) grid with quadrature
    weights exact for polynomials in cos(theta) up to degree nrings-1, obtained by a
    direct solve against the Legendre Vandermonde system (O(n^2); nrings is modest
    wherever this grid is used)."""
    th = (np.arange(nrings) + 0.5) * np.pi / nrings
    from numpy.polynomial.legendre import legvander
    V = legvander(np.cos(th), nrings - 1).T  # (nrings, nrings)
    rhs = np.zeros(nrings)
    rhs[0] = 2.
    w = np.linalg.solve(V, rhs)
    if nphi is None:
        nphi = good_fft_size(2 * nrings)
    return RingGeometry('ecp_%d' % nrings, th, w, int(nphi))
