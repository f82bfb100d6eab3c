r"""Exact C^{-1} (Wiener / inverse-variance) filtering by conjugate gradients.

TPU-native rebuild of the qcinv stack (reference: plancklens/qcinv/opfilt_tt.py,
plancklens/filt/filt_cinv.py:56-203): the linear system

    (S^{-1} + B^T Y^T N^{-1} Y B) x = B^T Y^T N^{-1} m

is solved with a jittable PCG (ops/cg.py) whose forward op costs two SHTs per iteration; a
batch of sims is a leading axis of one jitted solve. The D_l rescaling of the system for a
scale-balanced convergence criterion follows the reference (filt_cinv.py:82-92). The
low-multipole dense preconditioner is built by probing the forward operator — here with a
single *batched* apply over all (lmax_dense+1)^2 real-harmonic basis vectors rather than a
column-by-column loop (reference: plancklens/qcinv/dense.py:57-119).

Templates (monopole/dipole or arbitrary map marginalisation) deproject modes from N^{-1}
exactly as the reference (opfilt_tt.py:99-205).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ..utils import alm as ualm
from ..utils.cls import cli
from ..utils.hashing import clhash
from ..ops.sht import SHT, gl_geometry
from ..ops import cg


def _dense_cache_key(tag, lmax_dense, lmax, arrays):
    """Cache key for a persisted dense preconditioner.

    Hashes *every* input that shapes the probed operator (all ninv components, the signal
    cls slice, the transfer function, and the template-deprojection stack incl. its count)
    and uses the clamped dense lmax actually built, so a changed configuration can never
    silently load a stale matrix."""
    ld = min(lmax_dense, lmax)
    hs = '_'.join(str(clhash(np.atleast_1d(np.asarray(a, dtype=float)).ravel()))[:8]
                  for a in arrays)
    return 'dense_%s_%d_%d_%s' % (tag, ld, lmax, hs)


def _lm_ms(lmax):
    # numpy (host) constant: device arrays captured by traced closures cannot be
    # embedded by the axon relay (it fails fetching them at trace time); numpy embeds fine
    _, ms = ualm._lm_indices(lmax)
    return np.asarray(ms)


def template_maps(geom, which=('monopole', 'dipole')):
    """Pixel-space template maps to marginalise over: monopole and the three dipoles
    (reference: plancklens/qcinv/template_removal.py)."""
    th = geom.theta
    phi = geom.phi0 + 2. * np.pi * np.arange(geom.nphi) / geom.nphi
    sth, cth = np.sin(th)[:, None], np.cos(th)[:, None]
    out = []
    if 'monopole' in which:
        out.append(np.ones((geom.nrings, geom.nphi)))
    if 'dipole' in which:
        out.append(np.broadcast_to(cth, (geom.nrings, geom.nphi)).copy())
        out.append(sth * np.cos(phi)[None, :])
        out.append(sth * np.sin(phi)[None, :])
    return np.stack(out) if out else np.zeros((0, geom.nrings, geom.nphi))


class NinvFilterT:
    """Pixel-space inverse-noise filtering with template deprojection, spin 0.

    Args:
        geom: RingGeometry the maps live on
        ninv: (nrings, nphi) inverse noise variance per *pixel* (0 where masked)
        b_transf: beam/transfer function applied in the forward op
        marge_monopole, marge_dipole: marginalise these modes
        templates: optional extra (ntemp, nrings, nphi) template maps
    """

    def __init__(self, geom, ninv, b_transf, marge_monopole=True, marge_dipole=True,
                 templates=None):
        from ..utils.maps import read_map
        self.geom = geom
        # polymorphic spec: array, path, callable, or list-product of those
        self.ninv = read_map(ninv).reshape(geom.nrings, geom.nphi)
        self.b_transf = np.asarray(b_transf)
        # per-pixel inverse variance -> inverse variance per steradian, so that
        # Y^T N^{-1} Y = quadrature-analysis(ninv_st * synthesis(.))
        omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
        self.ninv_st = np.asarray(self.ninv / omega)
        which = (('monopole',) if marge_monopole else ()) + (('dipole',) if marge_dipole else ())
        tmpl = template_maps(geom, which)
        if templates is not None:
            tmpl = np.concatenate([tmpl, np.asarray(templates)], axis=0)
        self.templates = np.asarray(tmpl)
        if len(tmpl):
            PtNP = np.einsum('arp,brp->ab', np.asarray(tmpl) * self.ninv[None], tmpl)
            eigv, eigw = np.linalg.eigh(PtNP)
            self.PtNP_inv = np.asarray(eigw @ np.diag(cli(eigv)) @ eigw.T)
        else:
            self.PtNP_inv = None
        # average noise level over the UNMASKED sky for the effective ftl: the
        # reference normalises by the unmasked pixel count (filt_cinv.py:455-458
        # _calc_fal nnz), i.e. nlev_rad^2 = Omega_unmasked / sum(ninv); a full-sky
        # normalisation would inflate the level by 1/f_sky for any masked ninv
        omega_nnz = float(np.sum(omega[self.ninv > 0]))
        self.nlev_ftl = 10800. / np.sqrt(np.sum(self.ninv) / max(omega_nnz, 1e-300)) \
            / np.pi

    def hashdict(self):
        return {'ninv': clhash(self.ninv), 'b_transf': clhash(self.b_transf),
                'ntempl': int(self.templates.shape[0]), 'geom': self.geom.hashdict()}

    def apply_map(self, tmap):
        """N^{-1} with template modes deprojected; per-steradian units."""
        tmap = tmap * self.ninv_st[None]
        if self.PtNP_inv is not None:
            # templates are deprojected in per-pixel units, as in the reference
            omega = np.outer(self.geom.weight,
                             np.full(self.geom.nphi, 2. * np.pi / self.geom.nphi))
            tpix = tmap * omega[None]
            coeffs = jnp.einsum('trp,brp->bt', self.templates, tpix)
            coeffs = coeffs @ self.PtNP_inv.T
            pmodes = jnp.einsum('bt,trp->brp', coeffs, self.templates)
            tmap = tmap - pmodes * self.ninv_st[None]
        return tmap

    def make_ops(self, lmax, s_cltt, rescal_cl=None):
        """(fwd_op, calc_prep, pre_op_diag, dl) for the rescaled system at band limit lmax."""
        if rescal_cl is None:
            ls = np.arange(lmax + 1, dtype=float)
            rescal_cl = np.sqrt(ls * (ls + 1.) / (2. * np.pi))
            rescal_cl[0] = 1.
        dl = rescal_cl ** 2 * s_cltt[:lmax + 1]
        bdl = self.b_transf[:lmax + 1] * cli(rescal_cl)
        sht = SHT(self.geom, lmax)
        dli = np.asarray(cli(dl))
        bdlj = np.asarray(bdl)

        def apply_alm(x):
            """Y^T N^{-1} Y with beams, in rescaled units (opfilt_tt.apply_alm)."""
            t = ualm.almxfl(x, lmax, bdlj)
            m = sht.alm2map(t)
            m = self.apply_map(m)
            return ualm.almxfl(sht.map2alm(m), lmax, bdlj)

        def fwd_op(x):
            return ualm.almxfl(x, lmax, dli) + apply_alm(x)

        def calc_prep(maps):
            m = self.apply_map(jnp.asarray(maps))
            return ualm.almxfl(sht.map2alm(m), lmax, bdlj)

        ninv_cl = np.sum(self.ninv) / (4. * np.pi)
        diag = cli(cli(dl) + ninv_cl * bdl ** 2)
        diagj = np.asarray(diag)

        def pre_op_diag(r):
            return ualm.almxfl(r, lmax, diagj)

        return fwd_op, calc_prep, pre_op_diag, (rescal_cl, dl)


def _dmat_np(lmax, n, theta):
    """f64 numpy (lmax+1, mmax+1, nrings) array of d^l_{m,n}(theta): the engine's scaled
    Wigner recursion (ops/sht/core.recursion_tables) run on host — guarantees the exact
    conventions of the jitted Legendre scans."""
    from ..ops.sht.core import recursion_tables
    t = recursion_tables(lmax, lmax, n, np.asarray(theta, dtype=np.float64),
                         dtype=np.float64)
    S, tb = t['S'], t['np']
    alpha, beta, gamma = tb['alpha'], tb['beta'], tb['gamma']
    l0, sv, sk, x = tb['l0'], tb['seed_v'], tb['seed_k'], tb['x']
    nrings, mm = len(np.asarray(theta)), lmax + 1
    out = np.zeros((mm, mm, nrings))
    d_m1 = np.zeros((nrings, mm))
    d = np.where(l0[None, :] == 0, sv, 0.)
    k = np.where(l0[None, :] == 0, sk, 0).astype(np.int64)
    thresh, down = 2.0 ** (S // 2), 2.0 ** (-S)
    for l in range(mm):
        out[l] = (d * np.exp2(S * k.astype(np.float64))).T
        d_next = (alpha[l][None, :] * x[:, None] + beta[l][None, :]) * d \
            - gamma[l][None, :] * d_m1
        inject = (l + 1) == l0[None, :]
        d_new = np.where(inject, 0., d)
        d_next = np.where(inject, sv, d_next)
        k = np.where(inject, sk, k)
        cond = (k < 0) & (np.abs(d_next) > thresh)
        fac = np.where(cond, down, 1.)
        d_m1, d, k = d_new * fac, d_next * fac, k + cond
    return out


def _rlm_l_of(lmax):
    """l of every real-harmonic (rlm) packing index."""
    return np.floor(np.sqrt(np.arange((lmax + 1) ** 2))).astype(int)


def dense_block_analytic_t(filt, lmax_dense, dl, bdl):
    """Exact host-side (f64) low-l block of the rescaled T forward operator, in the
    real-harmonic basis, assembled analytically from the separable ring structure

        M[(lm),(l'm')] = S^{-1} delta + bdl_l bdl_l' fac_l fac_l'
                         sum_j d^l_m(j) d^{l'}_{m'}(j) x [ring Fourier modes of N^{-1}]

    with template deprojection as the exact low-rank correction.  No operator probing:
    on the f32 TPU path a probed matrix carries ~1e-6 relative noise which, inverted
    against the block's ~1e8 conditioning, destroys the preconditioner (measured:
    774 f32 iterations vs 78 in f64 with the probed dense-32 block, BENCH_r02); the
    analytic block is exact at any solver precision and far cheaper to build than
    probing (which needs (lmax_dense+1)^2 full-resolution forward applies).
    """
    geom = filt.geom
    Ld = lmax_dense
    theta = np.asarray(geom.theta, dtype=np.float64)
    nphi = geom.nphi
    phis = geom.phi0 + 2. * np.pi * np.arange(nphi) / nphi
    ninv = np.asarray(filt.ninv, dtype=np.float64)  # per-pixel inverse variance
    fac = np.sqrt((2. * np.arange(Ld + 1) + 1.) / (4. * np.pi))
    D = _dmat_np(Ld, 0, theta) * fac[:, None, None]          # [l, m, j], fac included
    ks = np.arange(2 * Ld + 1)
    CC = ninv @ np.cos(np.outer(phis, ks))                   # (nrings, 2 Ld + 1)
    SA = ninv @ np.sin(np.outer(phis, ks))
    nr = (Ld + 1) ** 2
    M = np.zeros((nr, nr))
    ls = np.arange(Ld + 1)
    rt2 = np.sqrt(2.)

    def idx(m, kind):  # rlm packing indices of (all l, m); kind 'c'/'s'
        # rows/cols with l < m alias other rlm slots, but their D rows are identically
        # zero, so the scatters only add zeros there
        if m == 0:
            return ls ** 2
        return ls ** 2 + 2 * m - (1 if kind == 'c' else 0)

    # one einsum per (m1, block kind) over all m2 at once: a python pair loop is
    # O(Ld^2) numpy dispatches (minutes at Ld >= 96); this form is O(Ld) calls
    m2s = np.arange(Ld + 1)
    idx_c = [idx(m, 'c') for m in range(Ld + 1)]
    idx_s = [idx(m, 's') for m in range(Ld + 1)]
    Dt = np.ascontiguousarray(D.transpose(1, 2, 0))          # [m2, j, l']

    def add_blocks(rows, col_idx, B, m2_from=0):
        for m2 in range(m2_from, Ld + 1):
            M[np.ix_(rows, col_idx[m2])] += B[:, m2, :]

    for m1 in range(Ld + 1):
        dk, sk_ = np.abs(m2s - m1), m2s + m1
        sgn = np.where(m2s >= m1, 1., -1.)   # SA(m2 - m1) = sgn * SA(|m2 - m1|)
        D1 = D[:, m1, :]
        # cos-cos: the dk == sk degeneracy at m = 0 folds into the coefficient
        one0 = (m1 == 0) != (m2s == 0)
        ccoef = np.where(one0, rt2 / 2., np.where((m1 == 0) & (m2s == 0), 0.5, 1.))
        Wcc = ccoef[None, :] * (CC[:, dk] + CC[:, sk_])
        add_blocks(idx_c[m1], idx_c,
                   np.einsum('lj,jm,mjk->lmk', D1, Wcc, Dt, optimize=True))
        # cos-sin
        Wcs = -(rt2 / 2. if m1 == 0 else 1.) * (SA[:, sk_] + sgn[None, :] * SA[:, dk])
        add_blocks(idx_c[m1], idx_s,
                   np.einsum('lj,jm,mjk->lmk', D1, Wcs, Dt, optimize=True), m2_from=1)
        if m1 > 0:
            # sin-cos and sin-sin
            sccoef = np.where(m2s == 0, rt2 / 2., 1.)
            Wsc = -sccoef[None, :] * (SA[:, sk_] - sgn[None, :] * SA[:, dk])
            add_blocks(idx_s[m1], idx_c,
                       np.einsum('lj,jm,mjk->lmk', D1, Wsc, Dt, optimize=True))
            Wss = CC[:, dk] - CC[:, sk_]
            add_blocks(idx_s[m1], idx_s,
                       np.einsum('lj,jm,mjk->lmk', D1, Wss, Dt, optimize=True),
                       m2_from=1)

    if filt.PtNP_inv is not None:
        # exact low-rank template-deprojection correction: M -= U^T (P^T N^-1 P)^-1 U
        ntmpl = filt.templates.shape[0]
        U = np.zeros((ntmpl, nr))
        cosm = np.cos(np.outer(phis, ls))
        sinm = np.sin(np.outer(phis, ls))
        for t in range(ntmpl):
            Wt = ninv * np.asarray(filt.templates[t], dtype=np.float64)
            RWc = Wt @ cosm                                   # (nrings, Ld+1)
            RWs = Wt @ sinm
            U[t, ls ** 2] = np.einsum('lj,j->l', D[:, 0, :], RWc[:, 0])
            for m in range(1, Ld + 1):
                lm = np.arange(m, Ld + 1)   # rlm slots l^2+2m-1/2m exist only for l >= m
                U[t, lm ** 2 + 2 * m - 1] = rt2 * np.einsum('lj,j->l',
                                                            D[lm, m, :], RWc[:, m])
                U[t, lm ** 2 + 2 * m] = -rt2 * np.einsum('lj,j->l',
                                                         D[lm, m, :], RWs[:, m])
        M -= U.T @ np.asarray(filt.PtNP_inv) @ U

    lof = _rlm_l_of(Ld)
    bl = np.asarray(bdl, dtype=np.float64)[lof]
    M = bl[:, None] * M * bl[None, :]
    M[np.arange(nr), np.arange(nr)] += cli(np.asarray(dl, dtype=np.float64))[lof]
    return 0.5 * (M + M.T)


def _dense_inverse(M, probe_noise=0.):
    """Eigen-pseudo-inverse of a dense block.  `probe_noise`: relative matrix noise
    level (nonzero for f32-probed blocks); eigenvalues below a few x that level are
    unreliable and their inverses are clamped instead of amplifying the noise."""
    eigv, eigw = np.linalg.eigh(M)
    lmax_abs = np.max(np.abs(eigv))
    keep = eigv > 1e-12 * lmax_abs
    floor = max(3. * probe_noise, 1e-14) * lmax_abs
    inv = 1. / np.maximum(eigv[keep], floor)
    return np.asarray((eigw[:, keep] * inv) @ eigw[:, keep].T)


def _dense_apply(Minv_j, lmax_dense, lmax):
    def pre_op(r):
        r_d = ualm.alm_copy(r, lmax, lmax_dense)
        rr = ualm.alm2rlm(r_d, lmax_dense)
        xr = rr @ Minv_j.T
        x_d = ualm.rlm2alm(xr, lmax_dense)
        return ualm.alm_copy(x_d, lmax_dense, lmax)
    return pre_op


def dense_pre_op_analytic_t(filt, lmax_dense, lmax, dl, bdl, cacher=None, cache_key=None):
    """Dense low-l preconditioner from the analytic f64 block (see
    dense_block_analytic_t) — the CinvT default."""
    if cacher is not None and cache_key is not None and cacher.is_cached(cache_key):
        Minv_j = np.asarray(cacher.load(cache_key))
    else:
        M = dense_block_analytic_t(filt, lmax_dense, dl[:lmax_dense + 1],
                                   bdl[:lmax_dense + 1])
        Minv_j = _dense_inverse(M)
        if cacher is not None and cache_key is not None:
            cacher.cache(cache_key, Minv_j)
    return _dense_apply(Minv_j.astype(np.float32) if not jax.config.jax_enable_x64
                        else Minv_j, lmax_dense, lmax)


def dense_pre_op(fwd_op, lmax_dense, lmax, chunk=512, cacher=None, cache_key=None):
    """Low-l dense preconditioner: probe fwd_op on all (lmax_dense+1)^2 real-harmonic basis
    vectors with chunked batched applies, eigendecompose, pseudo-invert
    (reference: plancklens/qcinv/dense.py:57-119, column loop -> batched apply).

    The probing is the expensive part (minutes at lmax_dense >= 32 on one core); pass a
    `cacher` + `cache_key` to persist the inverted matrix across runs (role of the
    reference's pickle cache, dense.py:60-68)."""
    if cacher is not None and cache_key is not None and cacher.is_cached(cache_key):
        Minv_j = np.asarray(cacher.load(cache_key))
    else:
        nrlm = (lmax_dense + 1) ** 2
        basis_r = jnp.eye(nrlm)
        basis_alm_d = ualm.rlm2alm(basis_r, lmax_dense)  # (nrlm, nalm_dense)
        basis_alm = ualm.alm_copy(basis_alm_d, lmax_dense, lmax)
        cols = jnp.concatenate([fwd_op(basis_alm[i:i + chunk])
                                for i in range(0, nrlm, chunk)], axis=0)
        cols_d = ualm.alm_copy(cols, lmax, lmax_dense)
        M = np.asarray(ualm.alm2rlm(cols_d, lmax_dense))  # (nrlm, nrlm)
        M = 0.5 * (M + M.T)
        # f32 probing leaves ~1e-6 relative noise in M; the inverse of the noisy
        # small-eigenvalue subspace would be pure amplified noise (it destroyed the f32
        # preconditioner outright, cf. dense_block_analytic_t) — clamp it
        probe32 = np.asarray(cols).dtype == np.complex64
        Minv_j = _dense_inverse(M, probe_noise=1e-6 if probe32 else 0.)
        if cacher is not None and cache_key is not None:
            cacher.cache(cache_key, Minv_j)

    return _dense_apply(Minv_j, lmax_dense, lmax)


def dense_pre_op_stacked(fwd_op, lmax_dense, lmax, ncomp, chunk=256, cacher=None,
                         cache_key=None):
    """Dense low-l preconditioner for stacked (batch, ncomp, nalm) operators (E/B pairs or
    T/E/B triplets): probe the full coupled operator on every (component, real-harmonic)
    basis vector with chunked batched applies, eigendecompose the
    (ncomp nrlm) x (ncomp nrlm) matrix, pseudo-invert
    (role of reference plancklens/qcinv/dense.py:123-285 pre_op_dense_pp/_tp).
    cacher/cache_key persist the inverted matrix across runs."""
    nrlm = (lmax_dense + 1) ** 2
    n = ncomp * nrlm
    if cacher is not None and cache_key is not None and cacher.is_cached(cache_key):
        Minv_j = np.asarray(cacher.load(cache_key))
    else:
        basis_alm = ualm.alm_copy(ualm.rlm2alm(jnp.eye(nrlm), lmax_dense), lmax_dense, lmax)
        nalm = basis_alm.shape[-1]
        blocks = []
        for c in range(ncomp):
            blk = jnp.zeros((nrlm, ncomp, nalm), dtype=basis_alm.dtype)
            blocks.append(blk.at[:, c, :].set(basis_alm))
        basis = jnp.concatenate(blocks)  # (n, ncomp, nalm), flat index = c * nrlm + r
        cols = jnp.concatenate([fwd_op(basis[i:i + chunk]) for i in range(0, n, chunk)])
        cols_d = ualm.alm_copy(cols.reshape(n * ncomp, nalm), lmax, lmax_dense)
        M = np.asarray(ualm.alm2rlm(cols_d, lmax_dense)).reshape(n, n)
        M = 0.5 * (M + M.T)
        probe32 = np.asarray(cols).dtype == np.complex64
        Minv_j = _dense_inverse(M, probe_noise=1e-6 if probe32 else 0.)
        if cacher is not None and cache_key is not None:
            cacher.cache(cache_key, Minv_j)

    def pre_op(r):
        bsz = r.shape[0]
        r_d = ualm.alm_copy(r.reshape(bsz * ncomp, -1), lmax, lmax_dense)
        rr = ualm.alm2rlm(r_d, lmax_dense).reshape(bsz, n)
        x_d = ualm.rlm2alm((rr @ Minv_j.T).reshape(bsz * ncomp, nrlm), lmax_dense)
        return ualm.alm_copy(x_d, lmax_dense, lmax).reshape(r.shape)

    return pre_op


def split_pre_op(low_op, diag_op, lmax_split, lmax):
    """Apply low_op below lmax_split, diag_op above (reference:
    plancklens/qcinv/multigrid.py:163-182). Works on (batch, nalm) and stacked
    (batch, ncomp, nalm) vectors alike (the l mask broadcasts over components)."""
    ls, _ = ualm._lm_indices(lmax)
    low_mask = np.asarray(ls <= lmax_split)

    def pre_op(r):
        r_low = jnp.where(low_mask, r, 0.)
        r_high = jnp.where(low_mask, 0., r)
        return jnp.where(low_mask, low_op(r_low), diag_op(r_high))

    return pre_op


class CinvT:
    """Temperature cinv filter (reference: plancklens/filt/filt_cinv.py:56-203).

    Args:
        lmax: band limit of the reconstruction
        geom: map geometry
        cl: dict with 'tt' fiducial spectrum
        transf: beam transfer function
        ninv: (nrings, nphi) inverse pixel-variance map
        eps_min: CG convergence criterion (relative residual)
        lmax_dense: band limit of the dense low-l preconditioner block (0 to disable)
    """

    def __init__(self, lmax, geom, cl, transf, ninv, marge_monopole=True, marge_dipole=True,
                 eps_min=1e-5, iter_max=300, lmax_dense=64, dense_cacher=None):
        self.lmax = lmax
        self.geom = geom
        self.cl = cl
        self.transf = np.asarray(transf)[:lmax + 1]
        self.filt = NinvFilterT(geom, ninv, self.transf, marge_monopole=marge_monopole,
                                marge_dipole=marge_dipole)
        self.eps_min = eps_min
        self.iter_max = iter_max
        self.fwd_op, self.calc_prep, self.pre_diag, (self.rescal_cl, self.dl) = \
            self.filt.make_ops(lmax, cl['tt'])
        self._ms = _lm_ms(lmax)
        if lmax_dense > 0:
            # the template stack (marge flags + extra templates) enters the operator
            # via the deprojection: it must be part of the key or two configurations
            # differing only in marginalisation would share a cached dense block
            key = _dense_cache_key('tta', lmax_dense, lmax,
                                   [self.filt.ninv, self.cl['tt'][:lmax + 1], self.transf,
                                    self.filt.templates.ravel(),
                                    [float(self.filt.templates.shape[0])]])
            ld = min(lmax_dense, lmax)
            # bdl of the rescaled system: beam x 1/rescal (cf. make_ops)
            bdl = self.transf[:lmax + 1] * cli(self.rescal_cl)
            dense = dense_pre_op_analytic_t(self.filt, ld, lmax, self.dl, bdl,
                                            cacher=dense_cacher, cache_key=key)
            self.pre_op = split_pre_op(dense, self.pre_diag, ld, lmax)
        else:
            self.pre_op = self.pre_diag

    def hashdict(self):
        return {'lmax': self.lmax, 'cltt': clhash(self.cl['tt'][:self.lmax + 1]),
                'transf': clhash(self.transf), 'ninv': self.filt.hashdict(),
                'eps': self.eps_min}

    def get_ftl(self):
        """Isotropic approximation to the filtering (reference: filt_cinv.py:157-175)."""
        nlev = self.filt.nlev_ftl
        ftl = cli(self.cl['tt'][:self.lmax + 1]
                  + (nlev / 60. / 180. * np.pi) ** 2 * cli(self.transf ** 2))
        if self.filt.PtNP_inv is not None:
            ftl[:2] *= 0.
        return ftl

    def get_tal(self):
        return cli(self.transf)

    def get_fmask(self):
        return np.where(self.filt.ninv > 0, 1., 0.)

    def solve_wf(self, tmaps, x0=None, monitor=None):
        """Rescaled Wiener solution of the system for (batch, nrings, nphi) maps.

        With `monitor` (e.g. ops/cg.monitor_basic) the solve runs host-driven with
        per-iteration diagnostics instead of the jitted while_loop."""
        tmaps = jnp.asarray(tmaps)
        if tmaps.ndim == 2:
            tmaps = tmaps[None]
        b = self.calc_prep(tmaps)
        if x0 is None:
            x0 = jnp.zeros_like(b)
        if monitor is not None:
            return cg.pcg_monitored(self.fwd_op, self.pre_op, b, x0, self._ms, monitor)
        x, it, rel = cg.pcg(self.fwd_op, self.pre_op, b, x0, self.iter_max,
                            self.eps_min, self._ms)
        return x, it, rel

    def apply_ivf(self, tmaps, x0=None, ret_it=False, ret_wf=False):
        """bar t = C^{-1}-weighted inverse-variance filtered alms of the input maps.

        x0 warm-starts the CG; ret_wf additionally returns the rescaled Wiener solution
        (reusable as the next x0, reference filt_cinv.py:196-203)."""
        x, it, rel = self.solve_wf(tmaps, x0=x0)
        # x solves the rescaled system; unrescaled ivf alm is x * rescal_cl / dl
        fl = np.asarray(self.rescal_cl * cli(self.dl))
        out = ualm.almxfl(x, self.lmax, fl)
        extras = ((it, rel) if ret_it else ()) + ((x,) if ret_wf else ())
        return (out,) + extras if extras else out


class NinvFilterP:
    """Polarisation (Q, U) pixel-space inverse-noise filtering, spin 2
    (reference: plancklens/qcinv/opfilt_pp.py:113-303).

    ninv is either a (nrings, nphi) array (QQ = UU, QU = 0) or a triplet
    (QQ, QU, UU) of such arrays.

    Template marginalisation (role of reference opfilt_pp.py:113-303 with
    template_removal.template_qmap/umap): `templates_q` / `templates_u` are lists of
    (nrings, nphi) maps living purely in Q (resp. U); the corresponding pixel modes are
    projected out of N^{-1} exactly, via (P^T N^{-1} P)^{-1}.
    """

    def __init__(self, geom, ninv, b_transf, templates_q=None, templates_u=None):
        from ..utils.maps import read_map
        self.geom = geom
        shape = (geom.nrings, geom.nphi)
        if isinstance(ninv, (list, tuple)):
            # (QQ,) or (QQ, QU, UU); each entry itself a polymorphic map spec
            assert len(ninv) in (1, 3)
            qq = read_map(ninv[0]).reshape(shape)
            if len(ninv) == 3:
                qu = read_map(ninv[1]).reshape(shape)
                uu = read_map(ninv[2]).reshape(shape)
            else:
                qu, uu = np.zeros_like(qq), qq.copy()
        else:
            qq = read_map(ninv).reshape(shape)
            qu, uu = np.zeros_like(qq), qq.copy()
        self.ninv = (qq, qu, uu)
        self.b_transf = np.asarray(b_transf)
        omega = np.outer(geom.weight, np.full(geom.nphi, 2. * np.pi / geom.nphi))
        self._omega = np.asarray(omega)
        self._st = tuple(np.asarray(m / omega) for m in self.ninv)
        # unmasked-sky normalisation, as for the T filter (reference filt_cinv.py:455-458)
        omega_nnz = float(np.sum(omega[(qq > 0) | (uu > 0)]))
        self.nlev_ftl = 10800. / np.sqrt(np.sum(0.5 * (qq + uu))
                                         / max(omega_nnz, 1e-300)) / np.pi
        # (ntempl, 2, nrings, nphi) stack of QU-space template maps
        tmpl = []
        for tq in (templates_q or []):
            tmpl.append(np.stack([np.asarray(tq), np.zeros_like(np.asarray(tq))]))
        for tu in (templates_u or []):
            tmpl.append(np.stack([np.zeros_like(np.asarray(tu)), np.asarray(tu)]))
        self.templates = np.stack(tmpl) if tmpl \
            else np.zeros((0, 2, geom.nrings, geom.nphi))
        if tmpl:
            t_np = np.stack(tmpl)
            # N^{-1} P in per-pixel units
            ninv_mat = np.stack([np.stack([qq, qu]), np.stack([qu, uu])])  # (2,2,r,p)
            NP = np.einsum('abrp,tbrp->tarp', ninv_mat, t_np)
            PtNP = np.einsum('tarp,sarp->ts', t_np, NP)
            eigv, eigw = np.linalg.eigh(PtNP)
            self.PtNP_inv = np.asarray(eigw @ np.diag(cli(eigv)) @ eigw.T)
        else:
            self.PtNP_inv = None

    def hashdict(self):
        return {'ninv': [clhash(m) for m in self.ninv], 'b_transf': clhash(self.b_transf),
                'ntempl': int(self.templates.shape[0]), 'geom': self.geom.hashdict()}

    def apply_map(self, qmap, umap):
        qq, qu, uu = self._st
        nq = qmap * qq[None] + umap * qu[None]
        nu = qmap * qu[None] + umap * uu[None]
        if self.PtNP_inv is not None:
            # deproject template modes (per-pixel units, as in the T filter)
            pix = jnp.stack([nq, nu], axis=1) * self._omega[None, None]  # (b, 2, r, p)
            coeffs = jnp.einsum('tarp,barp->bt', self.templates, pix) @ self.PtNP_inv.T
            modes = jnp.einsum('bt,tarp->barp', coeffs, self.templates)
            mq, mu = modes[:, 0], modes[:, 1]
            # N^{-1} modes in per-steradian units: the _st matrices already carry 1/omega
            nq = nq - (mq * qq[None] + mu * qu[None])
            nu = nu - (mq * qu[None] + mu * uu[None])
        return nq, nu

    def make_ops(self, lmax, s_clee, s_clbb, rescal_cl=None):
        """(fwd_op, calc_prep, pre_op_diag, scal) on stacked (batch, 2, nalm) E/B alms."""
        if rescal_cl is None:
            ls = np.arange(lmax + 1, dtype=float)
            rescal_cl = np.sqrt(ls * (ls + 1.) / (2. * np.pi))
            rescal_cl[0] = 1.
        dle = rescal_cl ** 2 * s_clee[:lmax + 1]
        dlb = rescal_cl ** 2 * s_clbb[:lmax + 1]
        bdl = self.b_transf[:lmax + 1] * cli(rescal_cl)
        sht = SHT(self.geom, lmax)
        dlei = np.asarray(cli(dle))
        dlbi = np.asarray(cli(dlb))
        bdlj = np.asarray(bdl)

        def apply_alm(x):
            e = ualm.almxfl(x[:, 0], lmax, bdlj)
            b = ualm.almxfl(x[:, 1], lmax, bdlj)
            q, u = sht.alm2map_spin((e, b), 2)
            q, u = self.apply_map(q, u)
            eo, bo = sht.map2alm_spin((q, u), 2)
            return jnp.stack([ualm.almxfl(eo, lmax, bdlj),
                              ualm.almxfl(bo, lmax, bdlj)], axis=1)

        def fwd_op(x):
            si = jnp.stack([ualm.almxfl(x[:, 0], lmax, dlei),
                            ualm.almxfl(x[:, 1], lmax, dlbi)], axis=1)
            return si + apply_alm(x)

        def calc_prep(qmaps, umaps):
            q, u = self.apply_map(jnp.asarray(qmaps), jnp.asarray(umaps))
            e, b = sht.map2alm_spin((q, u), 2)
            return jnp.stack([ualm.almxfl(e, lmax, bdlj),
                              ualm.almxfl(b, lmax, bdlj)], axis=1)

        qq, qu, uu = self.ninv
        ninv_cl = np.sum(0.5 * (qq + uu)) / (4. * np.pi)
        diag_e = cli(cli(dle) + ninv_cl * bdl ** 2)
        diag_b = cli(cli(dlb) + ninv_cl * bdl ** 2)
        de, db = np.asarray(diag_e), np.asarray(diag_b)

        def pre_op_diag(r):
            return jnp.stack([ualm.almxfl(r[:, 0], lmax, de),
                              ualm.almxfl(r[:, 1], lmax, db)], axis=1)

        return fwd_op, calc_prep, pre_op_diag, (rescal_cl, dle, dlb)


class CinvP:
    """Polarisation cinv filter (reference: plancklens/filt/filt_cinv.py:206-338).

    lmax_dense > 0 enables the dense low-l preconditioner of the coupled E/B operator
    (role of reference dense.py pre_op_dense_pp); templates_q/u marginalise Q/U pixel
    modes."""

    def __init__(self, lmax, geom, cl, transf, ninv, eps_min=1e-5, iter_max=300,
                 lmax_dense=0, templates_q=None, templates_u=None, dense_cacher=None):
        self.lmax = lmax
        self.geom = geom
        self.cl = cl
        self.transf = np.asarray(transf)[:lmax + 1]
        self.filt = NinvFilterP(geom, ninv, self.transf, templates_q=templates_q,
                                templates_u=templates_u)
        self.eps_min = eps_min
        self.iter_max = iter_max
        self.fwd_op, self.calc_prep, self.pre_diag, (self.rescal_cl, self.dle, self.dlb) = \
            self.filt.make_ops(lmax, cl['ee'], cl['bb'])
        if lmax_dense > 0:
            key = _dense_cache_key('pp', lmax_dense, lmax,
                                   list(self.filt.ninv) + [self.cl['ee'][:lmax + 1],
                                                           self.cl['bb'][:lmax + 1],
                                                           self.transf,
                                                           self.filt.templates.ravel(),
                                                           [float(self.filt.templates
                                                                  .shape[0])]])
            dense = dense_pre_op_stacked(self.fwd_op, min(lmax_dense, lmax), lmax, 2,
                                         cacher=dense_cacher, cache_key=key)
            self.pre_op = split_pre_op(dense, self.pre_diag, min(lmax_dense, lmax), lmax)
        else:
            self.pre_op = self.pre_diag
        self._ms = _lm_ms(lmax)

    def hashdict(self):
        return {'lmax': self.lmax, 'clee': clhash(self.cl['ee'][:self.lmax + 1]),
                'clbb': clhash(self.cl['bb'][:self.lmax + 1]),
                'transf': clhash(self.transf), 'ninv': self.filt.hashdict()}

    def get_fel(self):
        nlev = self.filt.nlev_ftl
        fel = cli(self.cl['ee'][:self.lmax + 1]
                  + (nlev / 60. / 180. * np.pi) ** 2 * cli(self.transf ** 2))
        fel[:2] *= 0.
        return fel

    def get_fbl(self):
        nlev = self.filt.nlev_ftl
        fbl = cli(self.cl['bb'][:self.lmax + 1]
                  + (nlev / 60. / 180. * np.pi) ** 2 * cli(self.transf ** 2))
        fbl[:2] *= 0.
        return fbl

    def get_fmask(self):
        qq, _, uu = self.filt.ninv
        return np.where((qq > 0) | (uu > 0), 1., 0.)

    def _dot_ms(self):
        # stacked (batch, 2, nalm) treated as a single vector
        return self._ms

    def solve_wf(self, qmaps, umaps, x0=None):
        qmaps = jnp.asarray(qmaps)
        if qmaps.ndim == 2:
            qmaps, umaps = qmaps[None], jnp.asarray(umaps)[None]
        b = self.calc_prep(qmaps, jnp.asarray(umaps))
        if x0 is None:
            x0 = jnp.zeros_like(b)
        bsz = b.shape[0]
        bf = b.reshape(bsz, -1)
        x0f = x0.reshape(bsz, -1)
        ms2 = jnp.concatenate([self._ms, self._ms])

        def fwd_flat(xf):
            return self.fwd_op(xf.reshape(b.shape)).reshape(bsz, -1)

        def pre_flat(rf):
            return self.pre_op(rf.reshape(b.shape)).reshape(bsz, -1)

        xf, it, rel = cg.pcg(fwd_flat, pre_flat, bf, x0f, self.iter_max,
                             self.eps_min, ms2)
        return xf.reshape(b.shape), it, rel

    def apply_ivf(self, qmaps, umaps, x0=None, ret_it=False, ret_wf=False):
        """(bar e, bar b) = C^{-1}-weighted inverse-variance filtered E/B alms.

        x0 warm-starts the CG from a previous rescaled Wiener solution; with ret_wf the
        solution is returned too (for a solution library, reference
        filt_cinv.py:196-203)."""
        x, it, rel = self.solve_wf(qmaps, umaps, x0=x0)
        fle = np.asarray(self.rescal_cl * cli(self.dle))
        flb = np.asarray(self.rescal_cl * cli(self.dlb))
        out = (ualm.almxfl(x[:, 0], self.lmax, fle), ualm.almxfl(x[:, 1], self.lmax, flb))
        extras = ((it, rel) if ret_it else ()) + ((x,) if ret_wf else ())
        return (out,) + extras if extras else out


class IVFCinv:
    """ivfs-interface adapter over CinvT/CinvP instances filtering a map-space sim library
    (reference: plancklens/filt/filt_cinv.py:515-626).

    `cacher` persists the filtered alms (restartability); `soltn_cacher` persists the raw
    CG solutions so re-runs (e.g. after a crash, or with a tightened eps) warm-start the
    solver instead of starting from zero (role of the reference's soltn_lib,
    filt_cinv.py:196-203, filt_simple.py:27-33)."""

    def __init__(self, cinv_t, cinv_p, sim_lib, cl_weights, cacher=None,
                 soltn_cacher=None):
        self.cinv_t = cinv_t
        self.cinv_p = cinv_p
        self.sim_lib = sim_lib
        self.cl = cl_weights
        self._cache = {}
        self.cacher = cacher
        self.soltn_cacher = soltn_cacher

    def _soltn(self, name):
        if self.soltn_cacher is not None and self.soltn_cacher.is_cached(name):
            return jnp.asarray(self.soltn_cacher.load(name))
        return None

    def _store_soltn(self, name, x):
        if self.soltn_cacher is not None:
            self.soltn_cacher.cache(name, np.asarray(x))

    def hashdict(self):
        return {'cinv_t': self.cinv_t.hashdict() if self.cinv_t else 0,
                'cinv_p': self.cinv_p.hashdict() if self.cinv_p else 0,
                'sims': self.sim_lib.hashdict()}

    def get_ftl(self):
        if self.cinv_t is None:
            raise ValueError('pol-only IVFCinv (cinv_t=None) has no temperature ftl')
        return self.cinv_t.get_ftl()

    def get_fel(self):
        if self.cinv_p is None:
            raise ValueError('T-only IVFCinv (cinv_p=None) has no polarisation fel')
        return self.cinv_p.get_fel()

    def get_fbl(self):
        if self.cinv_p is None:
            raise ValueError('T-only IVFCinv (cinv_p=None) has no polarisation fbl')
        return self.cinv_p.get_fbl()

    def get_tal(self, a):
        cinv = self.cinv_t if a == 't' else self.cinv_p
        if cinv is None:
            raise ValueError('IVFCinv has no %s sub-filter: cannot return tal(%r)'
                             % ('temperature' if a == 't' else 'polarisation', a))
        return cli(cinv.transf)

    def get_fmask(self):
        # pol-only libraries (cinv_t=None) report the polarisation mask
        return self.cinv_t.get_fmask() if self.cinv_t is not None \
            else self.cinv_p.get_fmask()

    def get_sim_tlm(self, idx):
        key = ('t', idx)
        if key not in self._cache:
            fn = 'ivf_tlm_%05d' % idx
            if self.cacher is not None and self.cacher.is_cached(fn):
                self._cache[key] = np.asarray(self.cacher.load(fn))
            else:
                tmap = self.sim_lib.get_sim_tmap(idx)
                out, x = self.cinv_t.apply_ivf(tmap, x0=self._soltn('wf_t_%05d' % idx),
                                               ret_wf=True)
                self._store_soltn('wf_t_%05d' % idx, x)
                self._cache[key] = np.asarray(out)[0]
                if self.cacher is not None:
                    self.cacher.cache(fn, self._cache[key])
        return jnp.asarray(self._cache[key])

    def _eb(self, idx):
        key = ('eb', idx)
        if key not in self._cache:
            fn_e, fn_b = 'ivf_elm_%05d' % idx, 'ivf_blm_%05d' % idx
            # gate the cached branch on *both* files so a crash between the two writes
            # falls back to recomputation instead of failing on the missing half
            if self.cacher is not None and self.cacher.is_cached(fn_e) \
                    and self.cacher.is_cached(fn_b):
                self._cache[key] = (np.asarray(self.cacher.load(fn_e)),
                                    np.asarray(self.cacher.load(fn_b)))
            else:
                q, u = self.sim_lib.get_sim_pmap(idx)
                (e, b), x = self.cinv_p.apply_ivf(q, u,
                                                  x0=self._soltn('wf_p_%05d' % idx),
                                                  ret_wf=True)
                self._store_soltn('wf_p_%05d' % idx, x)
                self._cache[key] = (np.asarray(e)[0], np.asarray(b)[0])
                if self.cacher is not None:
                    self.cacher.cache(fn_b, self._cache[key][1])
                    self.cacher.cache(fn_e, self._cache[key][0])
        return self._cache[key]

    def get_sim_elm(self, idx):
        return jnp.asarray(self._eb(idx)[0])

    def get_sim_blm(self, idx):
        return jnp.asarray(self._eb(idx)[1])

    def get_sim_tmliklm(self, idx):
        lmax = self.cinv_t.lmax
        return ualm.almxfl(self.get_sim_tlm(idx), lmax, jnp.asarray(self.cl['tt'][:lmax + 1]))

    def get_sim_emliklm(self, idx):
        lmax = self.cinv_p.lmax
        return ualm.almxfl(self.get_sim_elm(idx), lmax, jnp.asarray(self.cl['ee'][:lmax + 1]))

    def get_sim_bmliklm(self, idx):
        lmax = self.cinv_p.lmax
        return ualm.almxfl(self.get_sim_blm(idx), lmax, jnp.asarray(self.cl['bb'][:lmax + 1]))


def p2k_fl(lmax):
    """phi -> kappa scaling l(l+1)/2 (reference: plancklens/qcinv/opfilt_kk.py:29-45)."""
    ls = np.arange(lmax + 1, dtype=float)
    return 0.5 * ls * (ls + 1.)


class CinvKK(CinvT):
    """Wiener filter for reconstructed lensing-convergence maps: the spin-0 cinv machinery
    with C_L^kk = [L(L+1)/2]^2 C_L^pp spectra (reference: plancklens/qcinv/opfilt_kk.py).

    Args:
        lmax, geom, transf, ninv: as CinvT
        clpp: lensing potential spectrum (converted to kappa internally)
    """

    def __init__(self, lmax, geom, clpp, transf, ninv, **kwargs):
        clkk = {'tt': p2k_fl(lmax) ** 2 * np.asarray(clpp)[:lmax + 1]}
        super().__init__(lmax, geom, clkk, transf, ninv, **kwargs)


def template_uptolmin(geom, lmin):
    """All real-harmonic modes with l <= lmin as pixel-space template maps, for full
    low-l marginalisation (reference: plancklens/qcinv/template_removal.py
    template_uptolmin)."""
    from ..ops.sht import SHT
    from ..utils import alm as ualm
    import jax.numpy as jnp
    sht = SHT(geom, lmin)
    nrlm = (lmin + 1) ** 2
    rlm = np.eye(nrlm)
    alms = ualm.rlm2alm(jnp.asarray(rlm), lmin)
    return np.asarray(sht.alm2map(alms))


class NinvFilterTP:
    """Joint T/E/B pixel-space inverse-noise filtering (reference:
    plancklens/qcinv/opfilt_tp.py:164-326): T and (Q, U) noise treated jointly with the
    full 3x3 per-multipole signal matrix (including TE) in the prior.

    T-template marginalisation (monopole/dipole/extra maps) and Q/U templates are applied
    inside the respective pixel-space N^{-1} blocks (role of reference
    opfilt_tp.py:188-214)."""

    def __init__(self, geom, ninv_t, ninv_p, b_transf, marge_monopole=False,
                 marge_dipole=False, templates_t=None, templates_q=None, templates_u=None):
        self.geom = geom
        self.filt_t = NinvFilterT(geom, ninv_t, b_transf, marge_monopole=marge_monopole,
                                  marge_dipole=marge_dipole, templates=templates_t)
        self.filt_p = NinvFilterP(geom, ninv_p, b_transf, templates_q=templates_q,
                                  templates_u=templates_u)
        self.b_transf = np.asarray(b_transf)
        self.nlev_ftl = self.filt_t.nlev_ftl
        self.nlev_fpl = self.filt_p.nlev_ftl

    def hashdict(self):
        return {'t': self.filt_t.hashdict(), 'p': self.filt_p.hashdict()}

    def make_ops(self, lmax, cls, rescal_cl=None):
        """(fwd_op, calc_prep, pre_op, scal) on stacked (batch, 3, nalm) T/E/B alms.

        cls: dict with 'tt', 'ee', 'bb' and 'te' entering the 3x3 S matrix.
        """
        from ..utils.cls import cldict2arr
        if rescal_cl is None:
            ls = np.arange(lmax + 1, dtype=float)
            rescal_cl = np.sqrt(ls * (ls + 1.) / (2. * np.pi))
            rescal_cl[0] = 1.
        # rescaled 3x3 signal matrix and its pseudo-inverse
        S = cldict2arr({k: cls[k][:lmax + 1] for k in ['tt', 'ee', 'bb', 'te']
                        if k in cls})[:, :, :lmax + 1]
        S = np.moveaxis(S, -1, 0) * (rescal_cl ** 2)[:, None, None]
        Sinv = np.linalg.pinv(S)
        bdl = self.b_transf[:lmax + 1] * cli(rescal_cl)
        sht = SHT(self.geom, lmax)
        bdlj = np.asarray(bdl)
        ls_idx, _ = ualm._lm_indices(lmax)
        Sinv_j = np.asarray(Sinv)[ls_idx]  # (nalm, 3, 3)

        def apply_alm(x):
            t = ualm.almxfl(x[:, 0], lmax, bdlj)
            e = ualm.almxfl(x[:, 1], lmax, bdlj)
            b = ualm.almxfl(x[:, 2], lmax, bdlj)
            tm = self.filt_t.apply_map(sht.alm2map(t))
            q, u = sht.alm2map_spin((e, b), 2)
            q, u = self.filt_p.apply_map(q, u)
            to = sht.map2alm(tm)
            eo, bo = sht.map2alm_spin((q, u), 2)
            return jnp.stack([ualm.almxfl(to, lmax, bdlj),
                              ualm.almxfl(eo, lmax, bdlj),
                              ualm.almxfl(bo, lmax, bdlj)], axis=1)

        def fwd_op(x):
            si = jnp.einsum('aij,bja->bia', Sinv_j, x)
            return si + apply_alm(x)

        def calc_prep(tmaps, qmaps, umaps):
            tm = self.filt_t.apply_map(jnp.asarray(tmaps))
            q, u = self.filt_p.apply_map(jnp.asarray(qmaps), jnp.asarray(umaps))
            t = sht.map2alm(tm)
            e, b = sht.map2alm_spin((q, u), 2)
            return jnp.stack([ualm.almxfl(t, lmax, bdlj),
                              ualm.almxfl(e, lmax, bdlj),
                              ualm.almxfl(b, lmax, bdlj)], axis=1)

        # 3x3 diagonal-in-l preconditioner: (Sinv + avg_ninv b^2 I)^-1
        nt = np.sum(self.filt_t.ninv) / (4. * np.pi)
        qq, _, uu = self.filt_p.ninv
        npol = np.sum(0.5 * (qq + uu)) / (4. * np.pi)
        M = Sinv.copy()
        M[:, 0, 0] += nt * bdl ** 2
        M[:, 1, 1] += npol * bdl ** 2
        M[:, 2, 2] += npol * bdl ** 2
        Minv_j = np.asarray(np.linalg.pinv(M))[ls_idx]

        def pre_op(r):
            return jnp.einsum('aij,bja->bia', Minv_j, r)

        return fwd_op, calc_prep, pre_op, (rescal_cl, S)


class CinvTP:
    """Joint T/E/B cinv filter (reference: plancklens/filt/filt_cinv.py:341-512).

    lmax_dense > 0 enables the dense low-l preconditioner of the coupled 3x3 operator
    (role of reference dense.py pre_op_dense_tp); marge/template kwargs are forwarded to
    the pixel-space N^{-1} blocks."""

    def __init__(self, lmax, geom, cls, transf, ninv_t, ninv_p, eps_min=1e-5,
                 iter_max=400, lmax_dense=0, marge_monopole=False, marge_dipole=False,
                 templates_t=None, templates_q=None, templates_u=None, dense_cacher=None):
        self.lmax = lmax
        self.geom = geom
        self.cls = cls
        self.transf = np.asarray(transf)[:lmax + 1]
        self.filt = NinvFilterTP(geom, ninv_t, ninv_p, self.transf,
                                 marge_monopole=marge_monopole, marge_dipole=marge_dipole,
                                 templates_t=templates_t, templates_q=templates_q,
                                 templates_u=templates_u)
        self.eps_min = eps_min
        self.iter_max = iter_max
        self.fwd_op, self.calc_prep, self.pre_diag, (self.rescal_cl, self._S) = \
            self.filt.make_ops(lmax, cls)
        if lmax_dense > 0:
            key = _dense_cache_key(
                'tp', lmax_dense, lmax,
                [self.filt.filt_t.ninv] + list(self.filt.filt_p.ninv)
                + [np.asarray(cls[k])[:lmax + 1] for k in sorted(cls)] + [self.transf]
                + [self.filt.filt_t.templates.ravel(),
                   [float(self.filt.filt_t.templates.shape[0])],
                   self.filt.filt_p.templates.ravel(),
                   [float(self.filt.filt_p.templates.shape[0])]])
            dense = dense_pre_op_stacked(self.fwd_op, min(lmax_dense, lmax), lmax, 3,
                                         cacher=dense_cacher, cache_key=key)
            self.pre_op = split_pre_op(dense, self.pre_diag, min(lmax_dense, lmax), lmax)
        else:
            self.pre_op = self.pre_diag
        self._ms = _lm_ms(lmax)

    def hashdict(self):
        return {'lmax': self.lmax, 'transf': clhash(self.transf),
                'ninv': self.filt.hashdict(),
                **{k: clhash(self.cls[k][:self.lmax + 1]) for k in ['tt', 'ee', 'bb', 'te']
                   if k in self.cls}}

    def solve_wf(self, tmaps, qmaps, umaps, x0=None):
        tmaps = jnp.asarray(tmaps)
        if tmaps.ndim == 2:
            tmaps = tmaps[None]
            qmaps = jnp.asarray(qmaps)[None]
            umaps = jnp.asarray(umaps)[None]
        b = self.calc_prep(tmaps, qmaps, umaps)
        bsz = b.shape[0]
        bf = b.reshape(bsz, -1)
        x0f = jnp.zeros_like(bf) if x0 is None else jnp.asarray(x0).reshape(bsz, -1)
        ms3 = jnp.concatenate([self._ms] * 3)

        def fwd_flat(xf):
            return self.fwd_op(xf.reshape(b.shape)).reshape(bsz, -1)

        def pre_flat(rf):
            return self.pre_op(rf.reshape(b.shape)).reshape(bsz, -1)

        xf, it, rel = cg.pcg(fwd_flat, pre_flat, bf, x0f,
                             self.iter_max, self.eps_min, ms3)
        return xf.reshape(b.shape), it, rel

    def apply_ivf(self, tmaps, qmaps, umaps, x0=None, ret_it=False, ret_wf=False):
        """(bar t, bar e, bar b): jointly inverse-variance filtered alms (the rescaled
        Wiener solution mapped through the 3x3 S^{-1}). x0 warm-starts the CG; ret_wf
        additionally returns the rescaled Wiener solution."""
        x, it, rel = self.solve_wf(tmaps, qmaps, umaps, x0=x0)
        # bar X = S^{-1}_true x_wf_true; x is the rescaled WF: X_wf_true = x / rescal,
        # S_true = S_rescal / rescal^2  => bar X = rescal * (S_rescal^{-1} x)
        ls_idx, _ = ualm._lm_indices(self.lmax)
        Sinv_j = np.asarray(np.linalg.pinv(self._S))[ls_idx]
        bar = jnp.einsum('aij,bja->bia', Sinv_j, x)
        fl = np.asarray(self.rescal_cl)
        out = tuple(ualm.almxfl(bar[:, i], self.lmax, fl) for i in range(3))
        extras = ((it, rel) if ret_it else ()) + ((x,) if ret_wf else ())
        return (out,) + extras if extras else out

    def get_fal(self):
        """Isotropic approximation to the joint 3x3 filtering matrix, per multipole
        (reference: plancklens/filt/filt_cinv.py:446-475 cinv_tp._calc_fal): fiducial
        signal covariance plus the mean white-noise level seen through the beam,
        pseudo-inverted per l. Returned as a dict of the nonzero entries ('tt', 'te',
        'ee', 'bb', ...), directly consumable as a qresp/nhl fal argument or by
        models.filt.IVFJTP."""
        lmax = self.lmax
        fals = np.zeros((lmax + 1, 3, 3))
        for k, i, j in [('tt', 0, 0), ('te', 0, 1), ('tb', 0, 2), ('ee', 1, 1),
                        ('eb', 1, 2), ('bb', 2, 2)]:
            if k in self.cls:
                fals[:, i, j] = np.asarray(self.cls[k])[:lmax + 1]
                fals[:, j, i] = fals[:, i, j]
        nt = self.filt.nlev_ftl / 60. / 180. * np.pi
        npol = self.filt.nlev_fpl / 60. / 180. * np.pi
        ibl2 = cli(self.transf ** 2)
        fals[1:, 0, 0] += nt ** 2 * ibl2[1:]
        fals[2:, 1, 1] += npol ** 2 * ibl2[2:]
        fals[2:, 2, 2] += npol ** 2 * ibl2[2:]
        F = np.linalg.pinv(fals)
        out = {}
        for i, a in enumerate('teb'):
            for j, b in enumerate('teb'[i:]):
                if np.any(F[:, i, i + j]):
                    out[a + b] = F[:, i, i + j]
        return out

    def get_ftl(self):
        return self.get_fal()['tt']

    def get_fel(self):
        return self.get_fal()['ee']

    def get_fbl(self):
        return self.get_fal()['bb']

    def get_fmask(self):
        """Joint mask: pixels unmasked in BOTH the T and P inverse-variance maps
        (reference: filt_cinv.py:477-482 calc_mask). Only the QQ/UU diagonals gate the
        pol mask — QU is legitimately zero on unmasked pixels."""
        qq, _, uu = self.filt.filt_p.ninv
        return np.where((self.filt.filt_t.ninv > 0) & (qq > 0) & (uu > 0), 1., 0.)


class IVFCinvJTP:
    """ivfs-interface adapter over a joint CinvTP filter of a map-space sim library
    (reference: plancklens/filt/filt_cinv.py:585-626 library_cinv_jTP): one coupled
    T/E/B CG solve per sim feeds all three bar-alm accessors, with TE mixing handled
    inside the 3x3 operator rather than by separate T and P chains.

    `cacher` persists the filtered alms; `soltn_cacher` persists the raw CG solution
    so re-runs warm-start the solver (role of the reference's soltn_lib)."""

    def __init__(self, cinv_tp, sim_lib, cl_weights, cacher=None, soltn_cacher=None):
        self.cinv_tp = cinv_tp
        self.sim_lib = sim_lib
        self.cl = cl_weights
        self._cache = {}
        self.cacher = cacher
        self.soltn_cacher = soltn_cacher

    def hashdict(self):
        return {'cinv_tp': self.cinv_tp.hashdict(), 'sims': self.sim_lib.hashdict(),
                **{'clw_' + k: clhash(np.asarray(v)) for k, v in sorted(self.cl.items())}}

    def get_fal(self):
        return self.cinv_tp.get_fal()

    def get_ftl(self):
        return self.cinv_tp.get_ftl()

    def get_fel(self):
        return self.cinv_tp.get_fel()

    def get_fbl(self):
        return self.cinv_tp.get_fbl()

    def get_tal(self, a):
        assert a.lower() in ['t', 'e', 'b']
        return cli(self.cinv_tp.transf)

    def get_fmask(self):
        return self.cinv_tp.get_fmask()

    def _teb(self, idx):
        key = ('teb', idx)
        if key not in self._cache:
            fns = ['ivf_%slm_%05d' % (a, idx) for a in 'teb']
            # gate on all three files so a crash mid-write falls back to recompute
            if self.cacher is not None and all(self.cacher.is_cached(f) for f in fns):
                self._cache[key] = tuple(np.asarray(self.cacher.load(f)) for f in fns)
            else:
                tmap = self.sim_lib.get_sim_tmap(idx)
                q, u = self.sim_lib.get_sim_pmap(idx)
                sol = None
                if self.soltn_cacher is not None \
                        and self.soltn_cacher.is_cached('wf_tp_%05d' % idx):
                    sol = jnp.asarray(self.soltn_cacher.load('wf_tp_%05d' % idx))
                (t, e, b), x = self.cinv_tp.apply_ivf(tmap, q, u, x0=sol, ret_wf=True)
                if self.soltn_cacher is not None:
                    self.soltn_cacher.cache('wf_tp_%05d' % idx, np.asarray(x))
                self._cache[key] = tuple(np.asarray(a)[0] for a in (t, e, b))
                if self.cacher is not None:
                    for f, arr in zip(fns, self._cache[key]):
                        self.cacher.cache(f, arr)
        return self._cache[key]

    def get_sim_tlm(self, idx):
        return jnp.asarray(self._teb(idx)[0])

    def get_sim_elm(self, idx):
        return jnp.asarray(self._teb(idx)[1])

    def get_sim_blm(self, idx):
        return jnp.asarray(self._teb(idx)[2])

    def get_sim_teblm_batch(self, idxs):
        outs = [self._teb(int(i)) for i in np.atleast_1d(idxs)]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))

    def _wiener(self, idx, row):
        """Joint Wiener leg: row of C_w applied to (bar t, bar e, bar b)
        (reference: filt_simple.py:294-343 via library_jTP inheritance)."""
        t, e, b = self._teb(idx)
        lmax = self.cinv_tp.lmax
        z = np.zeros(lmax + 1)
        # tb/eb legs included whenever present in cl_weights, as the reference's
        # library_jTP.get_sim_{t,e,b}mliklm does (filt_simple.py:293-342)
        C = {k: np.asarray(self.cl[k])[:lmax + 1] if k in self.cl else z
             for k in ('tt', 'te', 'tb', 'ee', 'eb', 'bb')}
        rows = {'t': (C['tt'], C['te'], C['tb']), 'e': (C['te'], C['ee'], C['eb']),
                'b': (C['tb'], C['eb'], C['bb'])}[row]
        out = 0.
        for cl_row, alm in zip(rows, (t, e, b)):
            out = out + ualm.almxfl(jnp.asarray(alm), lmax, jnp.asarray(cl_row))
        return out

    def get_sim_tmliklm(self, idx):
        return self._wiener(idx, 't')

    def get_sim_emliklm(self, idx):
        return self._wiener(idx, 'e')

    def get_sim_bmliklm(self, idx):
        return self._wiener(idx, 'b')


def parse_pre_op_descr(descr, cinv, dense_cacher=None, stages=None):
    """Build a CG preconditioner from the reference's descriptor-string grammar
    (reference: plancklens/qcinv/multigrid.py:163-210 parse_pre_op_descr), against an
    existing CinvT / CinvP / CinvTP / CinvKK solver object:

      - ``diag_cl``                  the solver's diagonal preconditioner
      - ``dense`` / ``dense(key)``   dense low-l block over the enclosing band limit
                                     (analytic for T-like solvers, batched-probed for
                                     the stacked P / TEB operators); a non-empty
                                     ``key`` names the entry in `dense_cacher`
      - ``split(low, lsplit, high)`` `low` built at band limit lsplit, `high` above
      - ``stage(i)``                 entry i of `stages` (prebuilt pre-ops, e.g. from
                                     make_multigrid_pre_op)

    e.g. the reference's production T chain descriptor ``split(dense(""), 64, diag_cl)``
    reproduces exactly what ``CinvT(..., lmax_dense=64)`` wires by construction."""
    descr = descr.strip()
    if descr.startswith('split(') and descr.endswith(')'):
        # balance-parse the three arguments at top-level commas (a greedy regex
        # mis-parses a split nested in the high slot, e.g.
        # 'split(dense, 24, split(dense, 8, diag_cl))')
        args = _split_top_level(descr[len('split('):-1])
        assert len(args) == 3, 'split() takes exactly 3 arguments: %r' % descr
        low_descr, lsplit, high_descr = args[0], int(args[1]), args[2]
        low = _parse_pre_op_at(low_descr, cinv, lsplit, dense_cacher, stages)
        high = _parse_pre_op_at(high_descr, cinv, cinv.lmax, dense_cacher, stages)
        return split_pre_op(low, high, min(lsplit, cinv.lmax), cinv.lmax)
    return _parse_pre_op_at(descr, cinv, cinv.lmax, dense_cacher, stages)


def _split_top_level(s):
    """Split a descriptor argument list on commas at paren depth 0, honouring quoted
    strings (dense cache keys may carry commas, e.g. ``split(dense("a,b"), 64, ...)``)."""
    parts, depth, start, quote = [], 0, 0, None
    for i, c in enumerate(s):
        if quote is not None:
            if c == quote:
                quote = None
        elif c in '"\'':
            quote = c
        elif c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            assert depth >= 0, 'unbalanced parens in descriptor: %r' % s
        elif c == ',' and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    assert depth == 0 and quote is None, 'unbalanced descriptor: %r' % s
    parts.append(s[start:].strip())
    return parts


def _parse_pre_op_at(descr, cinv, ctx_lmax, dense_cacher, stages):
    """One descriptor at an enclosing band limit (the role of the lmax kwarg the
    reference threads through nested parse_pre_op_descr calls)."""
    import re
    descr = descr.strip()
    if re.match(r'split\(', descr):
        return parse_pre_op_descr(descr, cinv, dense_cacher=dense_cacher, stages=stages)
    if descr == 'diag_cl':
        return cinv.pre_diag
    m = re.match(r'dense(?:\((.*)\))?\Z', descr)
    if m:
        ld = min(ctx_lmax, cinv.lmax)
        key = m.group(1) or None
        if isinstance(cinv, CinvP):
            if key is None:
                key = _dense_cache_key('pp', ld, cinv.lmax,
                                       list(cinv.filt.ninv)
                                       + [cinv.cl['ee'][:cinv.lmax + 1],
                                          cinv.cl['bb'][:cinv.lmax + 1], cinv.transf,
                                          cinv.filt.templates.ravel(),
                                          [float(cinv.filt.templates.shape[0])]])
            return dense_pre_op_stacked(cinv.fwd_op, ld, cinv.lmax, 2,
                                        cacher=dense_cacher, cache_key=key)
        if isinstance(cinv, CinvTP):
            if key is None:
                key = _dense_cache_key('tp', ld, cinv.lmax,
                                       [cinv.filt.filt_t.ninv] + list(cinv.filt.filt_p.ninv)
                                       + [np.asarray(cinv.cls[k])[:cinv.lmax + 1]
                                          for k in sorted(cinv.cls)] + [cinv.transf])
            return dense_pre_op_stacked(cinv.fwd_op, ld, cinv.lmax, 3,
                                        cacher=dense_cacher, cache_key=key)
        # T-like (CinvT and its CinvKK subclass): the analytic f64 assembly
        if key is None:
            key = _dense_cache_key('tta', ld, cinv.lmax,
                                   [cinv.filt.ninv, cinv.cl['tt'][:cinv.lmax + 1],
                                    cinv.transf, cinv.filt.templates.ravel(),
                                    [float(cinv.filt.templates.shape[0])]])
        bdl = cinv.transf[:cinv.lmax + 1] * cli(cinv.rescal_cl)
        return dense_pre_op_analytic_t(cinv.filt, ld, cinv.lmax, cinv.dl, bdl,
                                       cacher=dense_cacher, cache_key=key)
    m = re.match(r'stage\((.*)\)\Z', descr)
    if m:
        assert stages is not None, 'stage(%s) needs the stages argument' % m.group(1)
        return stages[int(m.group(1))]
    raise ValueError('pre_op descriptor %r is unrecognized' % descr)


def degrade_ninv(ninv, geom_fine, geom_coarse, lmax_interp=None):
    """Restrict an inverse pixel-variance map to a coarser ring geometry: interpolate the
    per-steradian inverse variance spectrally and convert back to per-pixel units
    (role of hp.ud_grade(ninv, power=-2) in the reference, opfilt_tt.py:172-181)."""
    from ..ops.sht import SHT
    omega_f = np.outer(geom_fine.weight, np.full(geom_fine.nphi,
                                                 2. * np.pi / geom_fine.nphi))
    omega_c = np.outer(geom_coarse.weight, np.full(geom_coarse.nphi,
                                                   2. * np.pi / geom_coarse.nphi))
    lmax = geom_coarse.nrings - 1 if lmax_interp is None else lmax_interp
    sht_f = SHT(geom_fine, lmax)
    sht_c = SHT(geom_coarse, lmax)
    alm = sht_f.map2alm(np.asarray(ninv) / omega_f)
    out = np.asarray(sht_c.alm2map(alm))
    return np.maximum(out, 0.) * omega_c


def make_multigrid_pre_op(geom, ninv, b_transf, cltt, lmax, stage_lmaxs, stage_iters,
                          lmax_dense=32, marge_monopole=False, marge_dipole=False):
    """Multigrid-style preconditioner chain (reference: plancklens/qcinv/multigrid.py):
    each stage solves the same system restricted to a coarser band limit and geometry with
    a few fixed PCG iterations, preconditioned by the next stage; the innermost stage uses
    the dense low-l block. Returns a pre_op for the full-resolution system.

    Modes above stage_lmaxs[0] are handled by the full-resolution diagonal (the top
    stage is a split, as in the reference chain — a coarse-only preconditioner would be
    singular for the fine modes).

    Status: structurally correct but NOT the recommended preconditioner — in every
    benchmarked configuration (e.g. masked lmax 96, stages [64, 48]) plain diag and
    split(dense, diag) reach a lower residual in the same iteration count at a fraction
    of the per-iteration cost; provided for parity with the reference chain and for
    very-large-lmax regimes.
    """
    from ..ops.sht import gl_geometry

    def build(level):
        lm = stage_lmaxs[level]
        geom_l = gl_geometry(lm)
        ninv_l = degrade_ninv(ninv, geom, geom_l)
        filt_l = NinvFilterT(geom_l, ninv_l, b_transf[:lm + 1],
                             marge_monopole=marge_monopole, marge_dipole=marge_dipole)
        fwd_l, _, diag_l, _ = filt_l.make_ops(lm, cltt)
        if level + 1 < len(stage_lmaxs):
            low = build(level + 1)
            inner_pre = split_pre_op(low, diag_l, stage_lmaxs[level + 1], lm)
        else:
            dense = dense_pre_op(fwd_l, min(lmax_dense, lm), lm)
            inner_pre = split_pre_op(dense, diag_l, min(lmax_dense, lm), lm)
        ms_l = _lm_ms(lm)
        n_it = stage_iters[level]

        def pre_op(r):
            # r at the PARENT's band limit; restrict, solve approximately, prolongate
            lmax_parent = ualm.getlmax(r.shape[-1])
            r_c = ualm.alm_copy(r, lmax_parent, lm)
            x_c = cg.pcg_fixed(fwd_l, inner_pre, r_c, jnp.zeros_like(r_c), n_it, ms_l)
            return ualm.alm_copy(x_c, lm, lmax_parent)

        return pre_op

    chain = build(0)
    if stage_lmaxs[0] >= lmax:
        return chain
    filt_top = NinvFilterT(geom, ninv, b_transf[:lmax + 1],
                           marge_monopole=marge_monopole, marge_dipole=marge_dipole)
    _, _, diag_top, _ = filt_top.make_ops(lmax, cltt)
    return split_pre_op(chain, diag_top, stage_lmaxs[0], lmax)


def make_multigrid_pre_op_p(geom, ninv, b_transf, clee, clbb, lmax, stage_lmaxs,
                            stage_iters, lmax_dense=16):
    """Polarisation multigrid preconditioner chain for the coupled E/B (spin-2) system
    (reference: plancklens/qcinv/multigrid.py with opfilt_pp — the reference chain is
    opfilt-generic, multigrid.py:113-160; this is its pol instantiation here).

    Same structure as the T chain (make_multigrid_pre_op): each stage runs a few fixed
    PCG iterations of the system restricted to a coarser band limit/geometry,
    preconditioned by the next stage; the innermost stage uses the probed dense block
    of the coupled E/B operator. Operates on stacked (batch, 2, nalm) E/B vectors.

    Status: like the T chain, structurally correct but NOT the recommended
    preconditioner — measured on the coupled E/B system it loses to plain diag /
    split(dense, diag) (docs/PERF.md round-4 pol arm); provided for reference parity
    with the measured record of why it is default-off.
    """
    from ..ops.sht import gl_geometry
    trip = ninv if isinstance(ninv, (list, tuple)) else (ninv,)

    def build(level):
        lm = stage_lmaxs[level]
        geom_l = gl_geometry(lm)
        ninv_l = tuple(degrade_ninv(m, geom, geom_l) for m in trip)
        filt_l = NinvFilterP(geom_l, ninv_l, b_transf[:lm + 1])
        fwd_l, _, diag_l, _ = filt_l.make_ops(lm, clee, clbb)
        if level + 1 < len(stage_lmaxs):
            low = build(level + 1)
            inner_pre = split_pre_op(low, diag_l, stage_lmaxs[level + 1], lm)
        else:
            dense = dense_pre_op_stacked(fwd_l, min(lmax_dense, lm), lm, 2)
            inner_pre = split_pre_op(dense, diag_l, min(lmax_dense, lm), lm)
        ms2_l = jnp.concatenate([_lm_ms(lm), _lm_ms(lm)])
        nalm_l = ualm.getsize(lm)
        n_it = stage_iters[level]

        def pre_op(r):
            # r stacked (batch, 2, nalm) at the PARENT's band limit
            lmax_parent = ualm.getlmax(r.shape[-1])
            r_c = ualm.alm_copy(r, lmax_parent, lm)
            bsz = r_c.shape[0]

            def fwd_flat(xf):
                return fwd_l(xf.reshape(bsz, 2, nalm_l)).reshape(bsz, -1)

            def pre_flat(rf):
                return inner_pre(rf.reshape(bsz, 2, nalm_l)).reshape(bsz, -1)

            x_c = cg.pcg_fixed(fwd_flat, pre_flat, r_c.reshape(bsz, -1),
                               jnp.zeros((bsz, 2 * nalm_l), dtype=r_c.dtype),
                               n_it, ms2_l).reshape(bsz, 2, nalm_l)
            return ualm.alm_copy(x_c, lm, lmax_parent)

        return pre_op

    chain = build(0)
    if stage_lmaxs[0] >= lmax:
        return chain
    filt_top = NinvFilterP(geom, ninv, b_transf[:lmax + 1])
    _, _, diag_top, _ = filt_top.make_ops(lmax, clee, clbb)
    return split_pre_op(chain, diag_top, stage_lmaxs[0], lmax)
