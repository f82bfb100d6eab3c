r"""Simulation libraries: reproducible Gaussian CMB + noise skies, TPU-native.

The reference stores numpy RNG states in sqlite so any rank can regenerate any simulation
(reference: plancklens/sims/phas.py). Here determinism comes from stateless `jax.random`
keys folded with the simulation index — no database, no filesystem, and the whole sim batch
is one vmappable pure function, so hundreds of simulations become a leading array axis
sharded across the device mesh (replacing MPI rank striding over indices,
reference: examples/run_qlms.py:57).

Correlated fields are coloured by a per-multipole eigen-decomposition of the N_f x N_f
spectral matrix, as in the reference (reference: plancklens/sims/cmbs.py:25-101).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..utils import alm as ualm
from ..utils.hashing import clhash


@partial(jax.jit, static_argnums=(1, 2))
def unit_phases(key, nfields, lmax):
    """(nfields, nalm) unit-variance complex alm phases: <|xi_lm|^2> = 1, m=0 real.

    Generated in the real-harmonic basis so statistics are exact by construction
    (reference analogue: plancklens/sims/phas.py:157-195).
    """
    rlm = jax.random.normal(key, (nfields, (lmax + 1) ** 2))
    return ualm.rlm2alm(rlm, lmax)


def sim_key(base_key, idx):
    """Per-simulation PRNG key; idx -1 is the 'data' convention
    (reference: plancklens/sims/planck2018_sims.py:47-49)."""
    return jax.random.fold_in(base_key, idx + 1)


def cls_to_coloring(cls_dict, fields, lmax):
    """(lmax+1, nf, nf) matrix square root L(l) with L L^T = spectral matrix, via eigh
    (reference: plancklens/sims/cmbs.py:46-49)."""
    nf = len(fields)
    mat = np.zeros((lmax + 1, nf, nf))
    for i, f1 in enumerate(fields):
        for j, f2 in enumerate(fields):
            cl = cls_dict.get(f1 + f2, cls_dict.get(f2 + f1, None))
            if cl is not None:
                mat[:, i, j] = cl[:lmax + 1] if len(cl) > lmax else np.pad(cl, (0, lmax + 1 - len(cl)))
    w, v = np.linalg.eigh(mat)
    w = np.maximum(w, 0.)
    return np.einsum('lij,lj->lij', v, np.sqrt(w))


class CMBUnlLib:
    """Unlensed (or Gaussian-lensed-spectra) correlated CMB alm simulations.

    Args:
        cls: dict of spectra ('tt', 'te', 'ee', 'bb', 'pp', 'pt', ... as available)
        lmax: band limit of the simulations
        fields: tuple of field letters to generate, e.g. ('t', 'e', 'b', 'p')
        seed: integer seed of the whole library
    """

    def __init__(self, cls, lmax, fields=('t', 'e', 'b', 'p'), seed=0):
        self.cls = cls
        self.lmax = lmax
        self.fields = tuple(fields)
        self.seed = seed
        self._base_key = jax.random.PRNGKey(seed)
        self._L = jnp.asarray(cls_to_coloring(cls, self.fields, lmax))
        self._ls, _ = ualm._lm_indices(lmax)

    def hashdict(self):
        return {'lmax': self.lmax, 'fields': ''.join(self.fields), 'seed': self.seed,
                **{k: clhash(v) for k, v in self.cls.items()}}

    @partial(jax.jit, static_argnums=(0,))
    def _sim(self, key):
        xi = unit_phases(key, len(self.fields), self.lmax)  # (nf, nalm)
        L = self._L[self._ls]  # (nalm, nf, nf)
        return jnp.einsum('afg,ga->fa', L, xi)

    def get_sim_alms(self, idx):
        """(nfields, nalm) alms of simulation idx."""
        return self._sim(sim_key(self._base_key, idx))

    def get_sim_alms_batch(self, idxs):
        keys = jnp.stack([sim_key(self._base_key, int(i)) for i in np.atleast_1d(idxs)])
        return jax.vmap(self._sim)(keys)

    def _field_index(self, f):
        return self.fields.index(f)

    def get_sim_tlm(self, idx):
        return self.get_sim_alms(idx)[self._field_index('t')]

    def get_sim_elm(self, idx):
        return self.get_sim_alms(idx)[self._field_index('e')]

    def get_sim_blm(self, idx):
        return self.get_sim_alms(idx)[self._field_index('b')]

    def get_sim_plm(self, idx):
        return self.get_sim_alms(idx)[self._field_index('p')]

    def get_sim_olm(self, idx):
        """Curl deflection potential (field rotation) alm ω_lm — drawn whenever 'o' is
        in `fields` and the cls carry 'oo' (reference: plancklens/sims/cmbs.py:79-81)."""
        return self.get_sim_alms(idx)[self._field_index('o')]

    def get_sim_alm(self, idx, field):
        """Generic per-field accessor (reference: plancklens/sims/cmbs.py:71-77)."""
        assert field in self.fields, (field, self.fields)
        return self.get_sim_alms(idx)[self._field_index(field)]


class MapsNlevLib:
    """Beam-convolved CMB + homogeneous white noise, in harmonic space.

    TPU-native analogue of cmb_maps_nlev (reference: plancklens/sims/maps.py:101-173) in
    its harmonic-space variant (reference: plancklens/sims/maps.py:177-275): the 'observed'
    sky is transf * alm + noise alm with N_l = (nlev * pi/180/60)^2 (white), which on the
    full sky carries the same information as pixel-space noise maps without pixelisation.

    Args:
        cmb_lib: CMBUnlLib-like with get_sim_alms
        transf: transfer function/beam b_l (array, lmax+1)
        nlev_t, nlev_p: white noise levels in uK-arcmin
        seed: noise seed (independent of the CMB seed)
    """

    def __init__(self, cmb_lib, transf, nlev_t, nlev_p, seed=1000):
        self.cmb_lib = cmb_lib
        self.lmax = cmb_lib.lmax
        self.transf = np.asarray(transf)[:self.lmax + 1]
        self.nlev_t = nlev_t
        self.nlev_p = nlev_p
        self._noise_key = jax.random.PRNGKey(seed ^ 0x5eed)
        self._ls, _ = ualm._lm_indices(self.lmax)

    def hashdict(self):
        return {'cmb': self.cmb_lib.hashdict(), 'transf': clhash(self.transf),
                'nlev_t': self.nlev_t, 'nlev_p': self.nlev_p}

    @partial(jax.jit, static_argnums=(0,))
    def _obs(self, cmb_key, noise_key):
        alms = jax.vmap(lambda k: unit_phases(k, 3, self.lmax))(noise_key[None])[0]
        cmb = self.cmb_lib._sim(cmb_key)
        bl = jnp.asarray(self.transf)[self._ls]
        it = self.cmb_lib._field_index('t')
        ie = self.cmb_lib._field_index('e')
        ib = self.cmb_lib._field_index('b')
        sig_t = self.nlev_t / 60. / 180. * np.pi
        sig_p = self.nlev_p / 60. / 180. * np.pi
        tlm = cmb[it] * bl + alms[0] * sig_t
        elm = cmb[ie] * bl + alms[1] * sig_p
        blm = cmb[ib] * bl + alms[2] * sig_p
        return tlm, elm, blm

    def _keys(self, idx):
        return sim_key(self.cmb_lib._base_key, idx), sim_key(self._noise_key, idx)

    def get_sim_tlm(self, idx):
        return self._obs(*self._keys(idx))[0]

    def get_sim_elm(self, idx):
        return self._obs(*self._keys(idx))[1]

    def get_sim_blm(self, idx):
        return self._obs(*self._keys(idx))[2]

    def _noise(self, idx, i):
        """Noise-only alm of sim idx (0=t, 1=e, 2=b), the exact realisation entering
        the observed alm: obs = b_l cmb + noise holds identically (reference:
        plancklens/sims/maps.py:246-275 get_sim_{t,e,b}noise)."""
        alms = unit_phases(self._keys(idx)[1], 3, self.lmax)
        sig = (self.nlev_t if i == 0 else self.nlev_p) / 60. / 180. * np.pi
        return alms[i] * sig

    def get_sim_tnoise(self, idx):
        return self._noise(idx, 0)

    def get_sim_enoise(self, idx):
        return self._noise(idx, 1)

    def get_sim_bnoise(self, idx):
        return self._noise(idx, 2)

    def get_sim_teblm_batch(self, idxs):
        ks = [self._keys(int(i)) for i in np.atleast_1d(idxs)]
        ck = jnp.stack([k[0] for k in ks])
        nk = jnp.stack([k[1] for k in ks])
        return jax.vmap(self._obs)(ck, nk)  # 3-tuple of (nsims, nalm)


class CMBLenLib:
    """Lensed CMB simulations: unlensed T/E/B + phi (and optional curl) drawn from their
    joint spectra, lensed by the deflection-remap operator
    (reference: plancklens/sims/cmbs.py:104-233, lenspyx calls at cmbs.py:199-220).

    Maps are produced on the given geometry; harmonic-space observations are obtained by
    re-analysing the lensed maps (exact on the GL grid).

    Args:
        cls_unl: dict of unlensed spectra incl. 'pp' (and 'pt', 'pe' correlations if wanted)
        lmax: band limit of the unlensed skies and outputs
        geom: output RingGeometry
        seed: library seed
        dlmax: extra band-limit margin for the unlensed skies entering the remapping
    """

    def __init__(self, cls_unl, lmax, geom, fields=('t', 'e', 'b', 'p'), seed=0,
                 dlmax=128, oversample=4.0, order=9):
        from ..ops.lensing import Lensing
        from ..ops.sht import SHT
        self.lmax = lmax
        self.lmax_unl = lmax + dlmax
        self.geom = geom
        self.unl_lib = CMBUnlLib(cls_unl, self.lmax_unl, fields=fields, seed=seed)
        self.lensing = Lensing(geom, self.lmax_unl, lmax_p=self.lmax_unl,
                               oversample=oversample, order=order)
        self.sht = SHT(geom, lmax)

    def hashdict(self):
        return {'unl': self.unl_lib.hashdict(), 'lmax': self.lmax,
                'geom': self.geom.hashdict()}

    def get_sim_plm(self, idx):
        from ..utils import alm as ualm
        plm = self.unl_lib.get_sim_plm(idx)
        return ualm.alm_copy(plm, self.lmax_unl, self.lmax)

    def get_sim_olm(self, idx):
        """Curl deflection potential alm of sim idx, band-limited to lmax.  Unlike the
        reference — which draws ω but asserts 'not implemented' in the lensing path
        (plancklens/sims/cmbs.py:79-81,196) — here a drawn ω also DEFLECTS the maps
        (ops.lensing.deflection_field's curl term)."""
        from ..utils import alm as ualm
        olm = self.unl_lib.get_sim_olm(idx)
        return ualm.alm_copy(olm, self.lmax_unl, self.lmax)

    def get_sim_alm(self, idx, field):
        """Generic per-field accessor (reference: plancklens/sims/cmbs.py:169-182)."""
        return {'t': self.get_sim_tlm, 'e': self.get_sim_elm, 'b': self.get_sim_blm,
                'p': self.get_sim_plm, 'o': self.get_sim_olm}[field](idx)

    def _olm_unl(self, alms):
        """Curl potential entering the deflection (None when 'o' is not simulated)."""
        if 'o' not in self.unl_lib.fields:
            return None
        return alms[self.unl_lib._field_index('o')]

    def get_sim_tmap(self, idx):
        """Lensed temperature map on the geometry."""
        alms = self.unl_lib.get_sim_alms(idx)
        it = self.unl_lib._field_index('t')
        ip = self.unl_lib._field_index('p')
        return self.lensing.alm2lenmap(alms[it], alms[ip], olm=self._olm_unl(alms))[0]

    def get_sim_pmap(self, idx):
        """Lensed (Q, U) maps on the geometry."""
        alms = self.unl_lib.get_sim_alms(idx)
        ie = self.unl_lib._field_index('e')
        ib = self.unl_lib._field_index('b')
        ip = self.unl_lib._field_index('p')
        q, u = self.lensing.alm2lenmap_spin((alms[ie], alms[ib]), alms[ip], 2,
                                            olm=self._olm_unl(alms))
        return q[0], u[0]

    def get_sim_tlm(self, idx):
        """Lensed tlm, band-limited to lmax (exact GL analysis of the lensed map)."""
        return self.sht.map2alm(self.get_sim_tmap(idx))

    def get_sim_eblm(self, idx):
        q, u = self.get_sim_pmap(idx)
        return self.sht.map2alm_spin((q, u), 2)

    def get_sim_elm(self, idx):
        return self.get_sim_eblm(idx)[0]

    def get_sim_blm(self, idx):
        return self.get_sim_eblm(idx)[1]


class CMBUnlLibFixedPhi(CMBUnlLib):
    """Unlensed CMB sims sharing ONE lensing potential across all indices
    (reference: plancklens/sims/cmbs.py:236-261 sims_cmb_unl_fixed_phi): the phi slot
    of every simulation returns the same plm — by default the base library's
    sim-`phi_idx` draw, or an explicitly supplied `plm` — while the other fields keep
    their per-index draws.  The standard configuration for mean-field and
    response-by-simulation studies, where the deflection field must be common to the
    whole ensemble.

    Note the reference convention is kept: the non-phi fields are drawn with their
    usual coloring (including the component that would correlate them with *their own*
    per-index phi), so their cross-correlation with the fixed phi is broken by
    construction.
    """

    def __init__(self, cls, lmax, fields=('t', 'e', 'b', 'p'), seed=0,
                 plm=None, phi_idx=0):
        super().__init__(cls, lmax, fields=fields, seed=seed)
        assert 'p' in self.fields, self.fields
        self._phi_idx = int(phi_idx)
        self._external_plm = plm is not None
        if plm is not None:
            plm = jnp.asarray(plm)
            assert plm.shape == (ualm.getsize(lmax),), (plm.shape, lmax)
            self._plm_fix = plm
        else:
            self._plm_fix = super().get_sim_alms(self._phi_idx)[self._field_index('p')]

    def hashdict(self):
        d = super().hashdict()
        d['fixed_phi'] = clhash(np.abs(np.asarray(self._plm_fix))) \
            if self._external_plm else ('sim', self._phi_idx)
        return d

    def get_sim_alms(self, idx):
        alms = super().get_sim_alms(idx)
        return alms.at[self._field_index('p')].set(self._plm_fix)

    def get_sim_alms_batch(self, idxs):
        alms = super().get_sim_alms_batch(idxs)
        return alms.at[:, self._field_index('p')].set(self._plm_fix[None])


class CMBLenLibFixedPhi(CMBLenLib):
    """Lensed CMB sims with a common deflection field for every index
    (reference: plancklens/sims/cmbs.py:263-280 sims_cmb_len_fixed_phi): the unlensed
    library is swapped for :class:`CMBUnlLibFixedPhi`, so every sim is lensed by the
    SAME potential while the unlensed T/E/B vary.  `plm`, if given, must be at the
    internal band limit lmax + dlmax."""

    def __init__(self, cls_unl, lmax, geom, fields=('t', 'e', 'b', 'p'), seed=0,
                 dlmax=128, oversample=4.0, order=9, plm=None, phi_idx=0):
        super().__init__(cls_unl, lmax, geom, fields=fields, seed=seed, dlmax=dlmax,
                         oversample=oversample, order=order)
        self.unl_lib = CMBUnlLibFixedPhi(cls_unl, self.lmax_unl, fields=fields,
                                         seed=seed, plm=plm, phi_idx=phi_idx)


class ExternalAlmLib:
    """Simulation library backed by on-disk alm files, the role of the reference's
    NERSC FFP10 loaders (reference: plancklens/sims/planck2018_sims.py): idx >= 0 loads
    '<prefix>_<field>lm_%04d.<ext>', idx == -1 the data files '<prefix>_<field>lm_dat.<ext>'.

    ext='fits' reads healpy-format alm FITS files directly (utils.fitsio); ext='npy'
    reads raw triangular-layout arrays.
    """

    def __init__(self, tdir, prefix='sim', fields=('t', 'e', 'b'), ext='npy'):
        assert ext in ('npy', 'fits'), ext
        self.tdir = tdir
        self.prefix = prefix
        self.fields = fields
        self.ext = ext

    def hashdict(self):
        return {'tdir': self.tdir, 'prefix': self.prefix, 'fields': ''.join(self.fields)}

    def _fn(self, f, idx):
        import os
        tag = 'dat' if idx == -1 else '%04d' % idx
        return os.path.join(self.tdir, '%s_%slm_%s.%s' % (self.prefix, f, tag, self.ext))

    def _get(self, f, idx):
        if self.ext == 'fits':
            from ..utils.fitsio import read_alm
            return jnp.asarray(read_alm(self._fn(f, idx)))
        return jnp.asarray(np.load(self._fn(f, idx)))

    def get_sim_tlm(self, idx):
        return self._get('t', idx)

    def get_sim_elm(self, idx):
        return self._get('e', idx)

    def get_sim_blm(self, idx):
        return self._get('b', idx)

    def get_sim_plm(self, idx):
        return self._get('p', idx)

    def get_sim_teblm_batch(self, idxs):
        t = jnp.stack([self._get('t', int(i)) for i in np.atleast_1d(idxs)])
        e = jnp.stack([self._get('e', int(i)) for i in np.atleast_1d(idxs)])
        b = jnp.stack([self._get('b', int(i)) for i in np.atleast_1d(idxs)])
        return t, e, b


class AlmNlevLib:
    """Beam-convolved observations from ANY harmonic sim library + homogeneous white
    noise (role of reference plancklens/sims/planck2018_sims.py:122-158 ffp10cmb_widnoise:
    noise-free CMB alms — e.g. an ExternalAlmLib over FFP10 products — re-observed with a
    chosen white noise level). Noise is deterministic per (seed, idx)."""

    def __init__(self, alm_lib, lmax, transf, nlev_t, nlev_p, seed=3000):
        self.alm_lib = alm_lib
        self.lmax = lmax
        self.transf = np.asarray(transf)[:lmax + 1]
        self.nlev_t = nlev_t
        self.nlev_p = nlev_p
        self.seed = seed
        self._ls, _ = ualm._lm_indices(lmax)

    def hashdict(self):
        return {'alms': self.alm_lib.hashdict(), 'transf': clhash(self.transf),
                'nlev_t': self.nlev_t, 'nlev_p': self.nlev_p, 'seed': self.seed}

    def _obs(self, alm, idx, field_tag, nlev):
        alm = ualm.alm_copy(jnp.asarray(alm), ualm.getlmax(alm.shape[-1]), self.lmax)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), (idx + 2) * 8 + field_tag)  # idx -1 = data
        noise = unit_phases(key, 1, self.lmax)[0] * (nlev / 60. / 180. * np.pi)
        return ualm.almxfl(alm, self.lmax, jnp.asarray(self.transf)) + noise

    def get_sim_tlm(self, idx):
        return self._obs(self.alm_lib.get_sim_tlm(idx), idx, 0, self.nlev_t)

    def get_sim_elm(self, idx):
        return self._obs(self.alm_lib.get_sim_elm(idx), idx, 1, self.nlev_p)

    def get_sim_blm(self, idx):
        return self._obs(self.alm_lib.get_sim_blm(idx), idx, 2, self.nlev_p)

    def get_sim_teblm_batch(self, idxs):
        idxs = np.atleast_1d(idxs)
        t = jnp.stack([self.get_sim_tlm(int(i)) for i in idxs])
        e = jnp.stack([self.get_sim_elm(int(i)) for i in idxs])
        b = jnp.stack([self.get_sim_blm(int(i)) for i in idxs])
        return t, e, b


class SimLibShuffle:
    """Index-remapped view of a sim library (reference: plancklens/sims/utils.py:3-17)."""

    def __init__(self, sim_lib, idx_map):
        self.sim_lib = sim_lib
        self.idx_map = idx_map if callable(idx_map) else (lambda i, d=dict(idx_map): d.get(i, i))

    def hashdict(self):
        return {'sim_lib': self.sim_lib.hashdict(), 'shuffled': True}

    def __getattr__(self, name):
        if name.startswith('get_sim_'):
            inner = getattr(self.sim_lib, name)
            return lambda idx, *a, **kw: inner(self.idx_map(idx), *a, **kw)
        return getattr(self.sim_lib, name)


class SimLibAdd:
    """Weighted sum of two sim libraries, applied to sim and/or data indices
    (reference: plancklens/sims/utils.py:20-91, used to add extra power to noise sims)."""

    def __init__(self, lib_a, lib_b, w_a=1., w_b=1., sims_only=False, dat_only=False):
        self.a = lib_a
        self.b = lib_b
        self.wa, self.wb = w_a, w_b
        self.sims_only = sims_only
        self.dat_only = dat_only

    def hashdict(self):
        return {'a': self.a.hashdict(), 'b': self.b.hashdict(), 'wa': self.wa,
                'wb': self.wb, 'sims_only': self.sims_only, 'dat_only': self.dat_only}

    def _active(self, idx):
        if self.sims_only:
            return idx >= 0
        if self.dat_only:
            return idx == -1
        return True

    def _add(self, ra, rb):
        """wa*ra + wb*rb elementwise, supporting tuple returns (e.g. get_sim_pmap's
        (Q, U)) — a bare float * tuple would TypeError."""
        if isinstance(ra, (tuple, list)):
            return type(ra)(self.wa * x + self.wb * y for x, y in zip(ra, rb))
        return self.wa * ra + self.wb * rb

    def __getattr__(self, name):
        if name.endswith('_batch') and name.startswith('get_sim_'):
            # batched accessors take an index ARRAY: the scalar _active() gate is
            # ambiguous there, so sum per index group instead
            fa = getattr(self.a, name)

            def get_batch(idxs, *args, **kw):
                idxs = np.atleast_1d(idxs)
                ra = fa(idxs, *args, **kw)
                if all(self._active(int(i)) for i in idxs):
                    return self._add(ra, getattr(self.b, name)(idxs, *args, **kw))
                if not any(self._active(int(i)) for i in idxs):
                    return ra
                raise ValueError('SimLibAdd batch mixing active and inactive indices '
                                 '(sims_only/dat_only): split the batch')
            return get_batch
        if name.startswith('get_sim_'):
            fa = getattr(self.a, name)

            def get(idx, *args, **kw):
                ra = fa(idx, *args, **kw)
                if self._active(idx):
                    return self._add(ra, getattr(self.b, name)(idx, *args, **kw))
                return ra
            return get
        return getattr(self.a, name)


class AlmMapLib:
    """Map-space view of an alm simulation library on a ring geometry: the 'observed sky'
    interface the masked (cinv) filters consume (reference role: plancklens/sims/maps.py
    cmb_maps classes; here the observed alms, e.g. hp.map2alm of the SMICA map, carry the
    information and the maps are synthesised on the solver grid)."""

    def __init__(self, alm_lib, geom, lmax, dtype=None):
        from ..ops.sht import SHT
        self.alm_lib = alm_lib
        self.lmax = lmax
        kw = {} if dtype is None else {'dtype': dtype}
        self.sht = SHT(geom, lmax, **kw)

    def hashdict(self):
        return {'alm_lib': self.alm_lib.hashdict(), 'lmax': self.lmax,
                'geom': self.sht.geom.hashdict()}

    def get_sim_tmap(self, idx):
        return self.sht.alm2map(self.alm_lib.get_sim_tlm(idx))

    def get_sim_pmap(self, idx):
        elm = self.alm_lib.get_sim_elm(idx)
        blm = self.alm_lib.get_sim_blm(idx)
        return self.sht.alm2map_spin((elm, blm), 2)


class MapsLenNlevLib:
    """Beam-convolved lensed CMB maps + homogeneous white pixel noise on a ring geometry
    (reference: plancklens/sims/maps.py:101-173 cmb_maps_nlev over cmb_len_ffp10): the
    map-space observed-sky library the masked (cinv) filters consume.

    Pixel noise: sigma_pix = (nlev in uK amin, as rad) / sqrt(Omega_pix), with Omega_pix
    from the geometry's quadrature weights — the per-steradian convention of the filters.

    Args:
        len_lib: CMBLenLib-like with get_sim_tmap/get_sim_pmap on the same geometry
        transf: beam b_l; applied in harmonic space before the final synthesis
        nlev_t, nlev_p: white noise levels in uK-arcmin
        seed: noise seed (independent of the CMB seed)
    """

    def __init__(self, len_lib, transf, nlev_t, nlev_p, seed=2000):
        self.len_lib = len_lib
        self.geom = len_lib.geom
        self.lmax = len_lib.lmax
        self.transf = np.asarray(transf)[:self.lmax + 1]
        self.nlev_t = nlev_t
        self.nlev_p = nlev_p
        self.seed = seed
        g = self.geom
        omega = np.outer(g.weight, np.full(g.nphi, 2. * np.pi / g.nphi))
        self._sig_t = (nlev_t / 60. / 180. * np.pi) / np.sqrt(omega)
        self._sig_p = (nlev_p / 60. / 180. * np.pi) / np.sqrt(omega)

    def hashdict(self):
        return {'len': self.len_lib.hashdict(), 'transf': clhash(self.transf),
                'nlev_t': self.nlev_t, 'nlev_p': self.nlev_p, 'seed': self.seed}

    def ninv_t(self):
        return 1. / self._sig_t ** 2

    def ninv_p(self):
        return 1. / self._sig_p ** 2

    def _noise_key(self, idx, tag):
        """Stateless per-(sim, field) noise key: fold_in chain over (seed, idx, tag),
        matching the package's phase-library design (models/sims.py key folding) so the
        noise draws are device-side, reproducible and batchable. (Seed-compat note:
        round-4 and earlier drew this noise with host numpy RandomState((seed, idx+1,
        tag)) — same statistics, different realisations for a given seed.)"""
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), idx + 1)
        return jax.random.fold_in(key, tag)

    def get_sim_tmap(self, idx):
        tlm = self.len_lib.sht.map2alm(self.len_lib.get_sim_tmap(idx))
        tlm = ualm.almxfl(tlm, self.lmax, jnp.asarray(self.transf))
        t = self.len_lib.sht.alm2map(tlm)
        noise = jax.random.normal(self._noise_key(idx, 0), t.shape, dtype=t.dtype)
        return t + noise * jnp.asarray(self._sig_t)

    def get_sim_pmap(self, idx):
        elm, blm = self.len_lib.get_sim_eblm(idx)
        bl = jnp.asarray(self.transf)
        elm = ualm.almxfl(elm, self.lmax, bl)
        blm = ualm.almxfl(blm, self.lmax, bl)
        q, u = self.len_lib.sht.alm2map_spin((elm, blm), 2)
        nq, nu = jax.random.normal(self._noise_key(idx, 1), (2,) + q.shape,
                                   dtype=q.dtype)
        sig = jnp.asarray(self._sig_p)
        return q + nq * sig, u + nu * sig

    def get_sim_tnoise(self, idx):
        """Noise-only T map of sim idx — the exact realisation entering get_sim_tmap
        (reference: plancklens/sims/maps.py:136-148 get_sim_tnoise).  The draw dtype
        must match the map-path dtype (the SHT engine's): jax.random.normal returns
        different values, not rounded ones, per dtype."""
        shape = (len(self.geom.theta), self.geom.nphi)
        noise = jax.random.normal(self._noise_key(idx, 0), shape,
                                  dtype=self.len_lib.sht.dtype)
        return noise * jnp.asarray(self._sig_t)

    def _pnoise(self, idx):
        shape = (len(self.geom.theta), self.geom.nphi)
        nq, nu = jax.random.normal(self._noise_key(idx, 1), (2,) + shape,
                                   dtype=self.len_lib.sht.dtype)
        sig = jnp.asarray(self._sig_p)
        return nq * sig, nu * sig

    def get_sim_qnoise(self, idx):
        """Noise-only Q map (reference: plancklens/sims/maps.py:150-160)."""
        return self._pnoise(idx)[0]

    def get_sim_unoise(self, idx):
        """Noise-only U map (reference: plancklens/sims/maps.py:162-172)."""
        return self._pnoise(idx)[1]
