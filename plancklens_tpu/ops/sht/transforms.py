r"""Spin-s spherical harmonic transforms on iso-latitude ring geometries.

Replaces healpy/lenspyx `alm2map(_spin)` / `map2alm(_spin)` (reference:
plancklens/shts.py:4-35) with a two-phase TPU pipeline:
  (1) Legendre phase: the spin-weighted recursion engine (core.py), one lax.scan over l
      vectorised over (rings x m) and batched over fields;
  (2) longitude phase: one batched FFT over rings (uniform nphi).

Conventions (matching healpy's, as relied on by the reference's spin algebra,
cf. plancklens/utils_spin.py:1-34):
  _sY_lm = sqrt((2l+1)/4pi) d^l_{m,-s}(theta) e^{im phi}
  _{+s}a_lm = -(g_lm + i c_lm),   _{-s}a_lm = -(-1)^s (g_lm - i c_lm)
  alm2map_spin((g, c), s) = (re, im) of _sf = sum_lm (_s a_lm) _sY_lm
  spin 0: map = sum_lm (-t_lm) Y_lm is NOT applied here: alm2map(tlm) uses +t_lm like
  healpy; the -T convention lives in the QE layer exactly as in the reference.

map2alm uses the geometry quadrature weights: exact on the GL grid for band-limited input
(no healpy iteration needed).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ...utils import alm as ualm
from .core import legendre_synth, legendre_anal, legendre_synth_pair, legendre_anal_pair
from .geometry import RingGeometry, gl_geometry


def _facl(lmax):
    return np.sqrt((2. * np.arange(lmax + 1) + 1.) / (4. * np.pi))


@partial(jax.jit, static_argnums=(2, 3))
def _to_rings(Fp, Fm, nphi, phi0):
    """Assemble FFT bins and synthesize rings: f_k = sum_m Fp e^{im phi_k} + Fm e^{-im phi_k}.

    m is folded mod nphi into the FFT bins, so the synthesis stays exact at the grid
    points even when nphi < 2 mmax + 1 (the map is then merely non-invertible) — needed
    e.g. for deflection fields at lmax_unl evaluated on an lmax output grid."""
    batch, nrings, mmaxp1 = Fp.shape
    m = jnp.arange(mmaxp1)
    if phi0 != 0.:
        rot = jnp.exp(1j * m * phi0).astype(Fp.dtype)
        Fp = Fp * rot
        Fm = Fm * jnp.conj(rot)
    X = jnp.zeros((batch, nrings, nphi), dtype=jnp.complex128
                  if Fp.dtype == jnp.complex128 else jnp.complex64)
    mm = np.arange(mmaxp1)
    if mmaxp1 <= nphi - (mmaxp1 - 1):  # disjoint bins: cheap slice placement
        X = X.at[..., :mmaxp1].set(Fp)
        if mmaxp1 > 1:  # mmax == 0 has no negative-m bins ([..., 0:] would be the
            # full axis while the update is zero-length — a shape error)
            X = X.at[..., -mmaxp1 + 1:].add(Fm[..., 1:][..., ::-1])
    else:
        X = X.at[..., mm % nphi].add(Fp)
        X = X.at[..., (-mm[1:]) % nphi].add(Fm[..., 1:])
    return jnp.fft.ifft(X, axis=-1) * nphi


@partial(jax.jit, static_argnums=(1, 2))
def _from_rings(maps, mmax, phi0):
    """Extract G+_m, G-_m = (2pi/nphi) sum_k f_k e^{-+ im phi_k} from complex ring maps."""
    nphi = maps.shape[-1]
    assert nphi >= 2 * mmax + 1, \
        'analysis needs nphi >= 2 mmax + 1 (%d < %d)' % (nphi, 2 * mmax + 1)
    T = jnp.fft.fft(maps, axis=-1) * (2. * np.pi / nphi)
    Gp = T[..., :mmax + 1]
    # mmax == 0 must not take T[..., -0:] (the full axis, not an empty slice)
    neg = T[..., -mmax:][..., ::-1] if mmax > 0 else T[..., :0]
    Gm = jnp.concatenate([T[..., :1], neg], axis=-1)
    if phi0 != 0.:
        m = jnp.arange(mmax + 1)
        rot = jnp.exp(-1j * m * phi0).astype(Gp.dtype)
        Gp = Gp * rot
        Gm = Gm * jnp.conj(rot)
    return Gp, Gm


class SHT:
    """Spin-s synthesis/analysis bound to a geometry and band limit.

    All entry points accept healpy-layout triangular alm arrays with arbitrary leading
    batch dimensions, and maps shaped (..., nrings, nphi).
    """

    def __init__(self, geom_or_lmax, lmax=None, mmax=None, dtype=np.float64,
                 engine=None):
        if isinstance(geom_or_lmax, RingGeometry):
            assert lmax is not None
            self.geom = geom_or_lmax
        else:
            lmax = geom_or_lmax if lmax is None else lmax
            self.geom = gl_geometry(geom_or_lmax)
        self.lmax = lmax
        self.mmax = lmax if mmax is None else mmax
        if not jax.config.jax_enable_x64 and np.dtype(dtype) == np.float64:
            # without x64, f64 tables would be silently truncated (and their 2^S-scaled
            # seeds overflow f32); drop to the f32 engine with the matching exponent chunk
            dtype = np.float32
        self.dtype = dtype
        self.cdtype = np.complex128 if np.dtype(dtype) == np.float64 else np.complex64
        # 'xla' (lax.scan engine) or 'pallas' (VMEM-resident fused NS-pair TPU kernel,
        # f32). Default: $PLK_SHT_ENGINE if set; otherwise 'pallas' on TPU backends for
        # f32 transforms (the production path — the XLA scan engine is HBM-bound,
        # docs/PERF.md) and 'xla' elsewhere (CPU interpret mode is for testing only;
        # f64 transforms stay on the XLA engine, the kernels are f32).
        import os
        self.engine = engine if engine is not None else \
            os.environ.get('PLK_SHT_ENGINE', '') or \
            ('pallas' if (jax.default_backend() == 'tpu'
                          and np.dtype(self.dtype) == np.float32) else 'xla')
        if self.engine == 'pallas' and np.dtype(self.dtype) != np.float32:
            self.dtype = np.float32
            self.cdtype = np.complex64
        # optional two-phase mesh sharding (parallel.mesh.shard_sht): a dict with keys
        # 'mesh' and PartitionSpecs 'theta_m' (Legendre phase, m-sharded), 'theta_r' /
        # 'map' (FFT phase, ring-sharded), 'lm_m', 'alm'. When set, transforms carry
        # sharding constraints at the phase boundaries so the Legendre work partitions
        # over m, the ring FFTs over rings, with one all-to-all between the phases.
        self.shard = None

    # ------------------------------------------------------------------ helpers
    def _tok(self):
        return self.geom.token()

    def _sc(self, x, stage):
        """Apply the stage's sharding constraint (no-op without mesh sharding)."""
        if self.shard is None:
            return x
        from jax.sharding import NamedSharding
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.shard['mesh'], self.shard[stage]))

    def _ring_local(self, batch):
        """True when the FFT phase should run as an explicitly ring-local shard_map.

        Under mesh sharding the longitude FFTs are per-ring independent; running them
        inside `jax.shard_map` pins each device to whole local rings, which both states
        the design (ring-local FFTs, no mid-phase resharding) and sidesteps XLA-CPU's
        fft thunk rejecting the non-major layouts the global-view partitioner can pick
        for fused programs. Requires the ring count to divide over the 'm' axis AND the
        batch over the 'sims' axis (shard_map has no padding; uneven batches — e.g. the
        single data map — fall back to the sharding-constraint path)."""
        if self.shard is None:
            return False
        mesh = self.shard['mesh']
        if self.geom.nrings % mesh.shape['m'] != 0:
            return False
        n_sims = mesh.shape.get('sims', 1)
        return batch % n_sims == 0

    def _fft_to_rings(self, Fp, Fm):
        """_to_rings, ring-local per device when mesh-sharded (see _ring_local)."""
        if not self._ring_local(Fp.shape[0]):
            return _to_rings(Fp, Fm, self.geom.nphi, self.geom.phi0)
        fn = jax.shard_map(
            lambda a, b: _to_rings(a, b, self.geom.nphi, self.geom.phi0),
            mesh=self.shard['mesh'], in_specs=(self.shard['theta_r'],) * 2,
            out_specs=self.shard['map'])
        return fn(Fp, Fm)

    def _fft_from_rings(self, mc):
        """_from_rings, ring-local per device when mesh-sharded (see _ring_local)."""
        if not self._ring_local(mc.shape[0]):
            return _from_rings(mc, self.mmax, self.geom.phi0)
        fn = jax.shard_map(
            lambda a: _from_rings(a, self.mmax, self.geom.phi0),
            mesh=self.shard['mesh'], in_specs=self.shard['map'],
            out_specs=(self.shard['theta_r'],) * 2)
        return fn(mc)

    def _synth_pair(self, A, Abar, spin):
        """F+ and F- theta-functions for all m >= 0 (see module docstring for math).

        One fused Legendre call runs both the (-spin) and (+spin) recursions on the
        northern half of a symmetric grid (core.legendre_synth_pair)."""
        lmax, mmax = self.lmax, self.mmax
        fac = _facl(lmax).astype(self.dtype)[:, None]
        Cp = A * fac
        Cm = ((-1.) ** spin) * jnp.conj(Abar) * fac
        Cp = self._sc(Cp, 'lm_m')
        Cm = self._sc(Cm, 'lm_m')
        Fp, Fm = legendre_synth_pair(Cp, Cm, spin, self.geom.theta,
                                     grid_token=self._tok(), dtype=self.dtype,
                                     engine=self.engine)
        # Legendre phase ran m-sharded; re-shard to ring blocks (one all-to-all) so the
        # longitude FFTs run whole-ring local
        Fp = self._sc(self._sc(Fp, 'theta_m'), 'theta_r')
        Fm = self._sc(self._sc(Fm, 'theta_m'), 'theta_r')
        return Fp, Fm

    def _anal_pair(self, maps_c, spin):
        """A = _sa_lm and B = -(g - ic)_lm grids from complex ring maps."""
        lmax, mmax = self.lmax, self.mmax
        Gp, Gm = self._fft_from_rings(self._sc(maps_c, 'map'))
        # FFT phase ran ring-local; re-shard the (rings, m) grids to m columns (one
        # all-to-all) so the Legendre analysis partitions over m
        Gp = self._sc(self._sc(Gp, 'theta_r'), 'theta_m')
        Gm = self._sc(self._sc(Gm, 'theta_r'), 'theta_m')
        w = jnp.asarray(self.geom.weight.astype(self.dtype))[:, None]
        fac = _facl(lmax).astype(self.dtype)[:, None]
        A, Bc = legendre_anal_pair(Gp * w, Gm * w, spin, self.geom.theta, lmax,
                                   grid_token=self._tok(), dtype=self.dtype,
                                   engine=self.engine)
        A = self._sc(A, 'lm_m') * fac
        B = ((-1.) ** spin) * jnp.conj(self._sc(Bc, 'lm_m')) * fac
        return A, B

    def _to_grid(self, alm):
        """Full-layout triangular alm -> (lmax+1, mmax+1) dense grid (an mmax < lmax
        truncates the azimuthal band, as healpy's mmax does)."""
        A = ualm.alm2lm(jnp.asarray(alm, dtype=self.cdtype), self.lmax)
        return A if self.mmax == self.lmax else A[..., :self.mmax + 1]

    def _from_grid(self, A):
        """(lmax+1, mmax+1) dense grid -> full-layout triangular alm, zero beyond
        mmax. Padding before the triangular gather is required: lm2alm at full lmax
        on a narrower grid would silently CLAMP the m index (wrong values for
        m > mmax), not error."""
        if self.mmax < self.lmax:
            A = jnp.pad(A, ((0, 0),) * (A.ndim - 1) + ((0, self.lmax - self.mmax),))
        return ualm.lm2alm(A, self.lmax)

    # ------------------------------------------------------------------ spin 0
    def alm2map(self, tlm):
        """Real map from scalar alm (healpy convention, map = sum t_lm Y_lm)."""
        tlm = jnp.asarray(tlm)
        batch_shape = tlm.shape[:-1]
        A = self._to_grid(tlm.reshape((-1, tlm.shape[-1])))
        A = self._sc(A * _facl(self.lmax).astype(self.dtype)[:, None], 'lm_m')
        Fp, _ = legendre_synth_pair(A, None, 0,
                                    self.geom.theta, grid_token=self._tok(),
                                    dtype=self.dtype, engine=self.engine)
        Fp = self._sc(self._sc(Fp, 'theta_m'), 'theta_r')
        Fm = jnp.conj(Fp)
        f = self._fft_to_rings(Fp, Fm).real
        f = self._sc(f, 'map')
        return f.reshape(batch_shape + f.shape[-2:])

    def map2alm(self, m):
        """Scalar alm from real map, exact quadrature.

        Real input: the negative-m spectrum is the conjugate of the positive-m one, so a
        single (spin-0) Legendre analysis suffices."""
        m = jnp.asarray(m)
        batch_shape = m.shape[:-2]
        mc = m.reshape((-1,) + m.shape[-2:]).astype(self.cdtype)
        Gp, _ = self._fft_from_rings(self._sc(mc, 'map'))
        Gp = self._sc(self._sc(Gp, 'theta_r'), 'theta_m')
        w = jnp.asarray(self.geom.weight.astype(self.dtype))[:, None]
        A, _ = legendre_anal_pair(Gp * w, None, 0, self.geom.theta, self.lmax,
                                  grid_token=self._tok(), dtype=self.dtype,
                                  engine=self.engine)
        out = self._from_grid(self._sc(A, 'lm_m')
                              * _facl(self.lmax).astype(self.dtype)[:, None])
        out = self._sc(out, 'alm')
        return out.reshape(batch_shape + out.shape[-1:])

    # ------------------------------------------------------------------ spin s
    def alm2map_spin(self, gclm, spin):
        """(re, im) maps of _sf from (glm, clm); spin > 0."""
        assert spin > 0, spin
        glm, clm = gclm
        glm = jnp.asarray(glm)
        clm = jnp.broadcast_to(jnp.asarray(clm), glm.shape)
        batch_shape = glm.shape[:-1]
        G = self._to_grid(glm.reshape((-1, glm.shape[-1])))
        C = self._to_grid(clm.reshape((-1, clm.shape[-1])))
        A = -(G + 1j * C)
        Abar = -(G - 1j * C)
        Fp, Fm = self._synth_pair(A, Abar, spin)
        f = self._sc(self._fft_to_rings(Fp, Fm), 'map')
        f = f.reshape(batch_shape + f.shape[-2:])
        return f.real, f.imag

    def map2alm_spin(self, maps, spin):
        """(glm, clm) from (re, im) maps of _sf; spin > 0, exact quadrature."""
        assert spin > 0, spin
        m1, m2 = maps
        m1 = jnp.asarray(m1)
        batch_shape = m1.shape[:-2]
        mc = (m1 + 1j * jnp.asarray(m2)).reshape((-1,) + m1.shape[-2:]).astype(self.cdtype)
        A, B = self._anal_pair(mc, spin)
        glm = self._sc(self._from_grid(-0.5 * (A + B)), 'alm')
        clm = self._sc(self._from_grid(0.5j * (A - B)), 'alm')
        return glm.reshape(batch_shape + glm.shape[-1:]), \
            clm.reshape(batch_shape + clm.shape[-1:])
