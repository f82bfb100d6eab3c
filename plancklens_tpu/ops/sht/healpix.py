r"""HEALPix pixelisation support.

Ring layout of the HEALPix sphere (theta, nphi, phi0, per-pixel area) and spin-s
synthesis/analysis on it, so healpy-pixelised data can enter the pipeline directly
(reference role: plancklens/shts.py healpy backend).

TPU mapping: the Legendre phase is ring-geometry independent (the same scan engine as the
GL grid). The longitude phase splits by ring structure: the equatorial belt (half the
rings, all with nphi = 4 nside) is one batched FFT; the polar caps (varying nphi = 4i) are
evaluated by masked/padded direct DFT matmuls in ring blocks — MXU work instead of healpy's
per-ring C FFTs.

Analysis uses per-ring quadrature weights by default (the role of healpy's ring-weight
files: a minimal-norm correction to the pixel area making the m=0 quadrature exact up to
l < nrings); use_ring_weights=False gives healpy's plain map2alm iter=0 behaviour relied
on by the reference (cf. qcinv/opfilt_tt.py:30-36). Either way analysis is an approximate
inverse, exactly as in the reference pipeline.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ...utils import alm as ualm
from .core import legendre_synth, legendre_anal
from .transforms import _facl


class HealpixGeometry:
    """Ring description of the HEALPix sphere (RING ordering)."""

    def __init__(self, nside):
        self.nside = int(nside)
        ns = self.nside
        nrings = 4 * ns - 1
        i = np.arange(1, nrings + 1)
        z = np.empty(nrings)
        nphi = np.empty(nrings, dtype=int)
        phi0 = np.empty(nrings)
        # north cap
        cap = i < ns
        z[cap] = 1. - (i[cap] ** 2) / (3. * ns ** 2)
        nphi[cap] = 4 * i[cap]
        phi0[cap] = np.pi / (4. * i[cap])
        # equatorial belt
        eq = (i >= ns) & (i <= 3 * ns)
        z[eq] = 4. / 3. - 2. * i[eq] / (3. * ns)
        nphi[eq] = 4 * ns
        phi0[eq] = np.pi / (4. * ns) * (((i[eq] - ns) + 1) % 2)
        # south cap
        south = i > 3 * ns
        isouth = 4 * ns - i[south]
        z[south] = -(1. - (isouth ** 2) / (3. * ns ** 2))
        nphi[south] = 4 * isouth
        phi0[south] = np.pi / (4. * isouth)
        self.theta = np.arccos(z)
        self.nphi = nphi
        self.phi0 = phi0
        self.ofs = np.concatenate([[0], np.cumsum(nphi)])[:-1]
        self.npix = 12 * ns ** 2
        self.omega = 4. * np.pi / self.npix  # equal-area pixels

    @property
    def nrings(self):
        return len(self.theta)

    def ring_weights(self):
        """Per-ring quadrature weights making the m=0 analysis exact up to l < nrings
        (the role of healpy's ring weight files): solve sum_j w_j nphi_j P_l(z_j) =
        4 pi delta_l0."""
        if not hasattr(self, '_ring_w'):
            from numpy.polynomial.legendre import legvander
            z = np.cos(self.theta)
            # demand exact m=0 quadrature only up to 3*nside (the grid's reliable band;
            # exactness to nrings-1 = 4*nside-2 gives wildly oscillating weights), and take
            # the minimal-norm correction around the equal-area weights
            lmax_w = min(3 * self.nside, self.nrings - 1)
            V = legvander(z, lmax_w).T * self.nphi[None, :]
            rhs = np.zeros(lmax_w + 1)
            rhs[0] = 4. * np.pi
            w0 = np.full(self.nrings, self.omega)
            dw, *_ = np.linalg.lstsq(V, rhs - V @ w0, rcond=None)
            self._ring_w = w0 + dw
        return self._ring_w

    def token(self):
        return ('healpix', self.nside)

    def hashdict(self):
        return {'name': 'healpix', 'nside': self.nside}

    def pix2rings(self, m):
        """Flat RING-ordered map -> list of per-ring arrays (ragged)."""
        return [m[o:o + n] for o, n in zip(self.ofs, self.nphi)]


class HealpixSHT:
    """Spin-s SHT on the HEALPix grid.

    alm2map / alm2map_spin are exact (synthesis); map2alm / map2alm_spin use ring-weight
    quadrature by default (use_ring_weights=False gives healpy's equal-area iter=0
    behaviour), with optional Jacobi refinement (healpy's iter>0) via the iter argument.
    Maps are flat (npix,) RING-ordered arrays.
    """

    def __init__(self, nside, lmax, dtype=np.float64, use_ring_weights=True):
        self.geom = HealpixGeometry(nside)
        self.lmax = lmax
        self.mmax = lmax
        self.use_ring_weights = use_ring_weights
        if not jax.config.jax_enable_x64 and np.dtype(dtype) == np.float64:
            dtype = np.float32
        self.dtype = dtype
        self.cdtype = np.complex128 if np.dtype(dtype) == np.float64 else np.complex64
        g = self.geom
        ns = g.nside
        self._eq = slice(ns - 1, 3 * ns)           # rings with nphi = 4 nside
        self._cap_n = slice(0, ns - 1)
        self._cap_s = slice(3 * ns, 4 * ns - 1)
        # cap DFT matrices are built lazily per (m-block) to bound memory
        self._mgrid = np.arange(lmax + 1)

    # -------------------------------------------------------- longitude phase
    def _rings_to_map(self, F):
        """F (batch, nrings, mmax+1) complex ring Fourier coefficients (F+ convention with
        hermitian m<0 part folded via the real-field relation) -> flat maps.

        For real output maps with coefficients G_m = F[..., m]:
        f_k = G_0 + 2 sum_{m>0} Re(G_m e^{i m phi_k}).
        """
        g = self.geom
        batch = F.shape[0]
        out = jnp.zeros((batch, g.npix), dtype=F.real.dtype)
        # phase alignment to each ring's phi0
        m = jnp.arange(self.mmax + 1)
        F = F * jnp.exp(1j * m[None, None, :] * jnp.asarray(g.phi0)[None, :, None])
        # equatorial belt: one irfft
        nphi_eq = 4 * g.nside
        Feq = F[:, self._eq, :]
        nbins = nphi_eq // 2 + 1
        spec = jnp.zeros(Feq.shape[:2] + (nbins,), dtype=F.dtype)
        # fold aliases m -> m mod nphi into rfft bins (m <= lmax may exceed nphi/2)
        mm = np.arange(self.mmax + 1)
        fold = mm % nphi_eq
        conj = fold > nphi_eq // 2
        bin_idx = np.where(conj, nphi_eq - fold, fold)
        # irfft doubles interior bins (0 < b < n/2) itself; DC and Nyquist bins don't get
        # doubled, so m > 0 terms folding there need the factor 2 made explicit
        edge = ((bin_idx == 0) | (bin_idx == nphi_eq // 2)) & (mm > 0)
        vals = jnp.where(conj, jnp.conj(Feq), Feq) * jnp.where(edge, 2., 1.)[None, None, :]
        spec = spec.at[:, :, bin_idx].add(vals)
        eqmaps = jnp.fft.irfft(spec, n=nphi_eq, axis=-1) * nphi_eq
        eq_ofs = g.ofs[self._eq]
        idx = (eq_ofs[:, None] + np.arange(nphi_eq)[None, :]).ravel()
        out = out.at[:, idx].set(eqmaps.reshape(batch, -1))
        # caps: direct DFT per ring (padded loop over rings, static python loop over
        # distinct ring sizes; north and south share sizes)
        for icap in range(1, g.nside):
            npr = 4 * icap
            ks = np.arange(npr)
            phase = jnp.exp(2j * np.pi * np.outer(mm, ks) / npr)  # (mmax+1, npr)
            for ring in (icap - 1, 4 * g.nside - 1 - icap):
                Fr = F[:, ring, :]
                vals = jnp.real(Fr[:, 0:1]) + 2. * jnp.real(Fr[:, 1:] @ phase[1:])
                out = out.at[:, g.ofs[ring]:g.ofs[ring] + npr].set(vals.astype(out.dtype))
        return out

    def _map_to_rings(self, maps):
        """Adjoint-ish: flat maps -> G_m per ring = sum_k f_k e^{-i m phi_k} (no weights)."""
        g = self.geom
        batch = maps.shape[0]
        G = jnp.zeros((batch, g.nrings, self.mmax + 1), dtype=self.cdtype)
        nphi_eq = 4 * g.nside
        eq_ofs = g.ofs[self._eq]
        idx = (eq_ofs[:, None] + np.arange(nphi_eq)[None, :]).ravel()
        eqmaps = maps[:, idx].reshape(batch, -1, nphi_eq)
        T = jnp.fft.fft(eqmaps, axis=-1)
        mm = np.arange(self.mmax + 1)
        fold = mm % nphi_eq
        # bins fold with conjugation for m mod nphi > nphi/2 handled by fft symmetry of
        # real input: T[-m] = conj(T[m])
        Geq = T[:, :, fold]
        G = G.at[:, self._eq, :].set(Geq.astype(self.cdtype))
        for icap in range(1, g.nside):
            npr = 4 * icap
            ks = np.arange(npr)
            phase = jnp.exp(-2j * np.pi * np.outer(ks, mm) / npr)  # (npr, mmax+1)
            for ring in (icap - 1, 4 * g.nside - 1 - icap):
                vals = maps[:, g.ofs[ring]:g.ofs[ring] + npr].astype(self.cdtype) @ \
                    phase.astype(self.cdtype)
                G = G.at[:, ring, :].set(vals)
        m = jnp.arange(self.mmax + 1)
        G = G * jnp.exp(-1j * m[None, None, :] * jnp.asarray(g.phi0)[None, :, None])
        return G

    # -------------------------------------------------------------- transforms
    def alm2map(self, tlm):
        tlm = jnp.asarray(tlm)
        batch_shape = tlm.shape[:-1]
        A = ualm.alm2lm(tlm.reshape((-1, tlm.shape[-1])).astype(self.cdtype), self.lmax)
        Fp = legendre_synth(A * _facl(self.lmax)[:, None], 0, self.geom.theta,
                            grid_token=self.geom.token(), dtype=self.dtype)
        f = self._rings_to_map(Fp)
        return f.reshape(batch_shape + (self.geom.npix,))

    def _quad_w(self):
        if self.use_ring_weights:
            return jnp.asarray(self.geom.ring_weights())[None, :, None]
        return self.geom.omega

    def map2alm(self, m, iter=0):
        """Quadrature analysis, optionally Jacobi-refined (healpy map2alm iter semantics:
        alm <- alm + A(m - S(alm)), iter times)."""
        m = jnp.asarray(m)
        batch_shape = m.shape[:-1]
        mc = m.reshape((-1, m.shape[-1]))
        out = self._map2alm_once(mc)
        for _ in range(iter):
            resid = mc - self.alm2map(out)
            out = out + self._map2alm_once(resid)
        return out.reshape(batch_shape + out.shape[-1:])

    def _map2alm_once(self, mc):
        G = self._map_to_rings(mc) * self._quad_w()  # ring-weight quadrature
        A = legendre_anal(G, 0, self.geom.theta, self.lmax,
                          grid_token=self.geom.token(), dtype=self.dtype)
        A = A * _facl(self.lmax)[:, None]
        return ualm.lm2alm(A, self.lmax)

    def alm2map_spin(self, gclm, spin):
        """(re, im) flat maps of the spin field; healpy conventions as transforms.SHT."""
        assert spin > 0
        glm, clm = gclm
        glm = jnp.asarray(glm)
        clm = jnp.broadcast_to(jnp.asarray(clm), glm.shape)
        batch_shape = glm.shape[:-1]
        Gg = ualm.alm2lm(glm.reshape((-1, glm.shape[-1])).astype(self.cdtype), self.lmax)
        Cc = ualm.alm2lm(clm.reshape((-1, clm.shape[-1])).astype(self.cdtype), self.lmax)
        A = -(Gg + 1j * Cc)
        Abar = -(Gg - 1j * Cc)
        fac = _facl(self.lmax)[:, None]
        Fp = legendre_synth(A * fac, -spin, self.geom.theta,
                            grid_token=self.geom.token(), dtype=self.dtype)
        Fm = legendre_synth(((-1.) ** spin) * jnp.conj(Abar) * fac, spin, self.geom.theta,
                            grid_token=self.geom.token(), dtype=self.dtype)
        # complex map f = sum_{m>=0} Fp e^{im phi} + sum_{m>0} Fm e^{-im phi}:
        # Re f = Re(Fp_0) + sum_{m>0} Re[(Fp + conj(Fm)) e^{im phi}]
        # Im f = Im(Fp_0) + sum_{m>0} Re[-i (Fp - conj(Fm)) e^{im phi}]
        # and _rings_to_map(G) = Re(G_0) + 2 sum_{m>0} Re(G_m e^{im phi}):
        m0 = (jnp.arange(self.mmax + 1) == 0)[None, None, :]
        G1 = jnp.where(m0, Fp, 0.5 * (Fp + jnp.conj(Fm)))
        G2 = jnp.where(m0, -1j * Fp, -0.5j * (Fp - jnp.conj(Fm)))
        re = self._rings_to_map(G1)
        im = self._rings_to_map(G2)
        return (re.reshape(batch_shape + (self.geom.npix,)),
                im.reshape(batch_shape + (self.geom.npix,)))

    def map2alm_spin(self, maps, spin, iter=0):
        assert spin > 0
        m1, m2 = maps
        m1 = jnp.asarray(m1)
        batch_shape = m1.shape[:-1]
        mc1 = m1.reshape((-1, m1.shape[-1]))
        mc2 = jnp.asarray(m2).reshape(mc1.shape)
        glm, clm = self._map2alm_spin_once(mc1, mc2, spin)
        for _ in range(iter):
            r1, r2 = self.alm2map_spin((glm, clm), spin)
            dg, dc = self._map2alm_spin_once(mc1 - r1, mc2 - r2, spin)
            glm = glm + dg
            clm = clm + dc
        return (glm.reshape(batch_shape + glm.shape[-1:]),
                clm.reshape(batch_shape + clm.shape[-1:]))

    def _map2alm_spin_once(self, mc1, mc2, spin):
        # G+- from the complex map f = m1 + i m2: G+_m = DFT_m(f), G-_m = DFT_m(conj(f))*?
        Gp = self._map_to_rings_cplx(mc1, mc2, sign=+1) * self._quad_w()
        Gm = self._map_to_rings_cplx(mc1, mc2, sign=-1) * self._quad_w()
        fac = _facl(self.lmax)[:, None]
        A = legendre_anal(Gp, -spin, self.geom.theta, self.lmax,
                          grid_token=self.geom.token(), dtype=self.dtype) * fac
        Bc = legendre_anal(Gm, spin, self.geom.theta, self.lmax,
                           grid_token=self.geom.token(), dtype=self.dtype)
        B = ((-1.) ** spin) * jnp.conj(Bc) * fac
        glm = ualm.lm2alm(-0.5 * (A + B), self.lmax)
        clm = ualm.lm2alm(0.5j * (A - B), self.lmax)
        return glm, clm

    def _map_to_rings_cplx(self, m1, m2, sign=+1):
        """G_m = sum_k (m1 + i m2) e^{-sign * i m phi_k} per ring."""
        if sign > 0:
            return self._map_to_rings(m1) + 1j * self._map_to_rings(m2)
        # e^{+im phi}: conjugate trick on the real transforms
        return jnp.conj(self._map_to_rings(m1)) + 1j * jnp.conj(self._map_to_rings(m2))


def pixwin(nside, lmax, pol=False):
    """HEALPix pixel window function (the role of healpy's tabulated hp.pixwin,
    reference usage: params/smicadx12_planck2018.py:37).

    Exact per-pixel boundary-integral evaluation from :mod:`.pixwin` (shipped
    nside-128 table, self-similar rescale above — the same exact-then-extrapolate
    scheme healpy's own data files use); see that module for the method and its
    validation.  The pre-round-5 azimuthally-averaged tophat model survives as
    ``pixwin.pixwin_tophat`` (sub-percent for l <~ 2 nside).
    """
    from .pixwin import pixwin as _pixwin_exact_tabulated
    return _pixwin_exact_tabulated(nside, lmax, pol=pol)


def resample_to_rings(m, nside, geom):
    """Nearest-neighbour resampling of a RING-ordered HEALPix map onto a RingGeometry
    (uniform-nphi rings). For masks / inverse-variance maps entering the cinv filters,
    where values are piecewise constant and SHT interpolation would ring."""
    m = np.asarray(m)
    hg = HealpixGeometry(nside)
    # nearest healpix ring for each output ring
    r_of = np.searchsorted(hg.theta, geom.theta)
    r_of = np.clip(r_of, 1, hg.nrings - 1)
    r_of -= (geom.theta - hg.theta[r_of - 1]) < (hg.theta[np.minimum(r_of, hg.nrings - 1)]
                                                 - geom.theta)
    r_of = np.clip(r_of, 0, hg.nrings - 1)
    out = np.empty((geom.nrings, geom.nphi), dtype=m.dtype)
    phis = 2. * np.pi * np.arange(geom.nphi) / geom.nphi
    for i, r in enumerate(r_of):
        npr = hg.nphi[r]
        j = np.rint((phis - hg.phi0[r]) / (2. * np.pi) * npr).astype(np.int64) % npr
        out[i] = m[hg.ofs[r] + j]
    return out
