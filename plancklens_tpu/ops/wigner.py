"""Wigner small-d transforms on Gauss-Legendre grids, JAX-native.

Replaces the reference Fortran kernel (reference: plancklens/wigners/wigners.f90:313-561 and
its Python entry points wignerpos/wignercoeff used by plancklens/utils_spin.py:52-93).

Design (TPU-first): the Wigner functions d^l_{s1 s2}(x) are materialised once per
(a, b) = (|s1-s2|, |s1+s2|) pair on the cached GL grid — a `lax.scan` over the scaled-Jacobi
three-term recursion, vectorised across all quadrature nodes — and every synthesis/analysis
afterwards is a single (batched) matmul on the MXU. The reference instead re-runs the
recursion per call inside an OpenMP loop; here recursions are amortised and the hot path is
pure GEMM, which also batches trivially over many spectra.

Math: d^l_{s1 s2}(x) = xi * r_k * sin(b/2)^a cos(b/2)^b * P_k^{(a,b)}(x), with
k = l - (a+b)/2, r_k = sqrt(k! (k+a+b)! / ((k+a)! (k+b)!)), and xi = -1 iff
(s1 > s2 and s1 - s2 odd) else +1 (Jacobi representation of the d-matrix; same
parametrisation as the reference kernel, cf. wigners.f90:566-624).

Normalisations (identical to the reference):
  wignerpos(cl, x, s1, s2)        = sum_l cl_l (2l+1)/(4 pi) d^l_{s1 s2}(x)
  wignercoeff(xi, x, s1, s2, lmax) = 2 pi sum_i xi_i d^l_{s1 s2}(x_i)
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from scipy.special import gammaln

from .gauleg import gauleg, nquad_for

_F64 = np.float64


def _xi_sign(s1, s2):
    return -1.0 if (s1 > s2 and (s1 - s2) % 2 == 1) else 1.0


def _jacobi_rec_coeffs(K, a, b):
    """Three-term recursion coefficients for the *scaled* Jacobi polynomials
    p_k = r_k P_k^{(a,b)}: p_{k+1} = (At_k x + Bt_k) p_k - Ct_k p_{k-1}, k = 1..K-1.

    Returns float64 arrays (At, Bt, Ct) of length max(K-1, 0) plus the scale factors r_0, r_1.
    """
    a = float(a)
    b = float(b)
    k = np.arange(1, max(K, 1), dtype=_F64)
    tkab = 2. * k + a + b
    A = (tkab + 1.) * (tkab + 2.) / (2. * (k + 1.) * (k + a + b + 1.))
    B = (tkab + 1.) * (a * a - b * b) / (2. * (k + 1.) * (k + a + b + 1.) * tkab)
    C = (k + a) * (k + b) * (tkab + 2.) / ((k + 1.) * (k + a + b + 1.) * tkab)
    # rho_k = r_k / r_{k-1}
    kk = np.arange(0, max(K, 1) + 1, dtype=_F64)
    rho = np.ones_like(kk)
    rho[1:] = np.sqrt(kk[1:] * (kk[1:] + a + b) / ((kk[1:] + a) * (kk[1:] + b)))
    At = A * rho[2:2 + len(k)]
    Bt = B * rho[2:2 + len(k)]
    Ct = C * rho[2:2 + len(k)] * rho[1:1 + len(k)]
    lnr0 = 0.5 * (gammaln(1.) + gammaln(a + b + 1.) - gammaln(a + 1.) - gammaln(b + 1.))
    r0 = np.exp(lnr0)
    r1 = r0 * rho[1] if K >= 1 else r0
    return At, Bt, Ct, r0, r1


@partial(jax.jit, static_argnums=(0,))
def _jacobi_pmat(K, coeffs, p0, p1, x):
    """Stack [p_0(x), ..., p_K(x)] as a (K+1, nx) float64 matrix via lax.scan."""
    if K == 0:
        return p0[None, :]
    if K == 1:
        return jnp.stack([p0, p1])
    At, Bt, Ct = coeffs

    def step(carry, abc):
        pkm1, pk = carry
        at, bt, ct = abc
        pkp1 = (at * x + bt) * pk - ct * pkm1
        return (pk, pkp1), pkp1

    _, ps = jax.lax.scan(step, (p0, p1), (At, Bt, Ct))
    return jnp.concatenate([jnp.stack([p0, p1]), ps], axis=0)


# LRU cache of d-matrices keyed by (a, b, lmax, grid_token); values are (lmax+1, nx) jax
# arrays. A full MV response touches ~20 distinct (a, b) pairs; PLK_DMAT_CACHE sizes the
# cache (each entry is ~(lmax+1) x 1.5 lmax float64, ~50 MB at lmax 2048).
import os as _os
_DMAT_CACHE = {}
_DMAT_CACHE_MAX = int(_os.environ.get('PLK_DMAT_CACHE', 24))


def clear_cache():
    _DMAT_CACHE.clear()


def _dmat_ab(lmax, a, b, x, grid_token=None):
    """(lmax+1, nx) matrix of xi-free d-functions: rows l < (a+b)/2 are zero, rows l >= l0
    are r_k sin^a cos^b P_k^{(a,b)}(x)."""
    key = (a, b, lmax, grid_token) if grid_token is not None else None
    if key is not None and key in _DMAT_CACHE:
        return _DMAT_CACHE.setdefault(key, _DMAT_CACHE.pop(key))  # refresh LRU position
    l0 = (a + b) // 2
    x = jnp.asarray(x, dtype=jnp.float64)
    nx = x.shape[0]
    if lmax < l0:
        out = jnp.zeros((lmax + 1, nx), dtype=jnp.float64)
    else:
        K = lmax - l0
        At, Bt, Ct, r0, r1 = _jacobi_rec_coeffs(K, a, b)
        pref = jnp.ones_like(x)
        if a > 0:
            pref = pref * (0.5 * (1. - x)) ** (0.5 * a)
        if b > 0:
            pref = pref * (0.5 * (1. + x)) ** (0.5 * b)
        p0 = r0 * pref
        p1 = (r1 * ((a + 1.) + 0.5 * (a + b + 2.) * (x - 1.))) * pref if K >= 1 else p0
        pmat = _jacobi_pmat(K, (jnp.asarray(At), jnp.asarray(Bt), jnp.asarray(Ct)), p0, p1, x)
        if l0 > 0:
            pmat = jnp.concatenate([jnp.zeros((l0, nx), dtype=pmat.dtype), pmat], axis=0)
        out = pmat
    out = jax.device_put(out)
    if key is not None:
        if len(_DMAT_CACHE) >= _DMAT_CACHE_MAX:
            _DMAT_CACHE.pop(next(iter(_DMAT_CACHE)))
        _DMAT_CACHE[key] = out
    return out


def wigner_dmat(lmax, s1, s2, x, grid_token=None):
    """Dense (lmax+1, nx) matrix of d^l_{s1 s2}(x_i), float64."""
    a, b = abs(s1 - s2), abs(s1 + s2)
    base = _dmat_ab(lmax, a, b, x, grid_token=grid_token)
    xi = _xi_sign(s1, s2)
    return base if xi > 0 else -base


def _native_dispatch(*arrays):
    """True when the opt-in C++/OpenMP host kernels should serve this call:
    PLK_NATIVE=1, the library is built, and every operand is a host numpy array
    (never a tracer — jitted callers always see jax arrays and stay on the
    cached-dmat path)."""
    import os
    if os.environ.get('PLK_NATIVE', '0') != '1':
        return False
    from .. import native
    if not native.have_native():
        return False
    return all(isinstance(a, np.ndarray) and not np.iscomplexobj(a) for a in arrays)


def wignerpos(cl, x, s1, s2, grid_token=None):
    """Position-space synthesis sum_l cl_l (2l+1)/(4 pi) d^l_{s1 s2}(x).

    `cl` may have leading batch dimensions; real or complex.
    """
    if np.ndim(cl) == 1 and _native_dispatch(cl, x):
        from .. import native
        return native.wignerpos(cl, x, s1, s2)
    cl = jnp.asarray(cl)
    lmax = cl.shape[-1] - 1
    dmat = wigner_dmat(lmax, s1, s2, x, grid_token=grid_token)
    fac = (2. * np.arange(lmax + 1) + 1.) / (4. * np.pi)
    return (cl * fac) @ dmat.astype(cl.dtype) if jnp.iscomplexobj(cl) else (cl * fac) @ dmat


def wignercoeff(xi, x, s1, s2, lmax, grid_token=None):
    """Analysis 2 pi sum_i xi_i d^l_{s1 s2}(x_i) for l = 0..lmax.

    For exact quadrature, xi must include the GL weights.
    `xi` may have leading batch dimensions; real or complex.
    """
    if np.ndim(xi) == 1 and _native_dispatch(xi, x):
        from .. import native
        return native.wignercoeff(xi, x, s1, s2, lmax)
    xi = jnp.asarray(xi)
    dmat = wigner_dmat(lmax, s1, s2, x, grid_token=grid_token)
    dm = dmat.astype(xi.dtype) if jnp.iscomplexobj(xi) else dmat
    return 2. * np.pi * (xi @ dm.T)


def wignerc(cl1, cl2, sp1, s1, sp2, s2, lmax_out=None):
    """Legendre/Wigner coefficients of the product of two correlation functions:
    harmonic-space convolution via exact GL quadrature
    (reference: plancklens/utils_spin.py:52-93).

    Returns a float64 (or complex128) array of length lmax_out + 1.
    """
    cl1 = np.asarray(cl1)
    cl2 = np.asarray(cl2)
    lmax1 = len(cl1) - 1
    lmax2 = len(cl2) - 1
    if lmax_out is None:
        lmax_out = lmax1 + lmax2
    if not (np.any(cl1) and np.any(cl2)):
        return np.zeros(lmax_out + 1, dtype=float)
    lmaxtot = lmax1 + lmax2 + lmax_out
    npts = nquad_for(lmaxtot)
    xg, wg = gauleg(npts)
    tok = ('gl', npts)
    xi1 = wignerpos(cl1, xg, sp1, s1, grid_token=tok)
    xi2 = wignerpos(cl2, xg, sp2, s2, grid_token=tok)
    ret = wignercoeff(xi1 * xi2 * wg, xg, sp1 + sp2, s1 + s2, lmax_out, grid_token=tok)
    ret = np.asarray(ret)
    if not (np.iscomplexobj(cl1) or np.iscomplexobj(cl2)):
        return ret.real.copy() if np.iscomplexobj(ret) else ret
    return ret


def wignerc_stack(specs, lmax_out):
    """Batched harmonic-space convolutions: evaluate many `wignerc`-type contractions with
    a handful of stacked GEMMs instead of one host round-trip per term.

    `specs` is a sequence of tuples ``(cl1, (sp1, s1), cl2, (sp2, s2))``; row ``i`` of the
    returned ``(len(specs), lmax_out + 1)`` array equals
    ``wignerc(cl1, cl2, sp1, s1, sp2, s2, lmax_out=lmax_out)``.

    Design: all terms share one GL grid sized for the worst-case bandwidth (GL quadrature
    stays exact on any finer grid). Both synthesis legs and the analysis leg are grouped by
    their Wigner-d matrix identity ``(a, b) = (|s-s'|, |s+s'|)``; each group is a single
    (n_group, lmax+1) x (lmax+1, npts) matmul on the cached d-matrix, so the device sees
    O(#distinct spin pairs) GEMMs — typically < 10 — regardless of the number of terms.
    Rows whose product vanishes identically are returned as zeros, matching `wignerc`.
    """
    n = len(specs)
    if n == 0:
        return np.zeros((0, lmax_out + 1), dtype=float)
    cl1s = [np.atleast_1d(np.asarray(s[0])) for s in specs]
    cl2s = [np.atleast_1d(np.asarray(s[2])) for s in specs]
    live = np.array([bool(np.any(c1)) and bool(np.any(c2))
                     for c1, c2 in zip(cl1s, cl2s)])
    any_cplx = any(np.iscomplexobj(c) for c in cl1s + cl2s)
    out_dtype = np.complex128 if any_cplx else np.float64
    out = np.zeros((n, lmax_out + 1), dtype=out_dtype)
    if not np.any(live):
        return out

    idx_live = np.flatnonzero(live)
    bandwidth = max(len(cl1s[i]) + len(cl2s[i]) - 2 for i in idx_live)
    npts = nquad_for(bandwidth + lmax_out)
    xg, wg = gauleg(npts)
    tok = ('gl', npts)

    def _synth_grouped(cls_list, spin_pairs):
        """All position-space legs, one GEMM per distinct spin pair."""
        xi = np.zeros((len(idx_live), npts),
                      dtype=np.complex128 if any_cplx else np.float64)
        groups = {}
        for row, i in enumerate(idx_live):
            groups.setdefault(spin_pairs[i], []).append(row)
        for (sa, sb), rows in groups.items():
            lmax_g = max(len(cls_list[idx_live[r]]) for r in rows) - 1
            stack = np.zeros((len(rows), lmax_g + 1),
                             dtype=np.complex128 if any_cplx else np.float64)
            for j, r in enumerate(rows):
                cl = cls_list[idx_live[r]]
                stack[j, :len(cl)] = cl
            xi[rows] = np.asarray(wignerpos(stack, xg, sa, sb, grid_token=tok))
        return xi

    sp1s = [s[1] for s in specs]
    sp2s = [s[3] for s in specs]
    prod = _synth_grouped(cl1s, sp1s) * _synth_grouped(cl2s, sp2s) * wg

    out_groups = {}
    for row, i in enumerate(idx_live):
        so = (sp1s[i][0] + sp2s[i][0], sp1s[i][1] + sp2s[i][1])
        out_groups.setdefault(so, []).append(row)
    res = np.zeros((len(idx_live), lmax_out + 1),
                   dtype=np.complex128 if any_cplx else np.float64)
    for (sa, sb), rows in out_groups.items():
        res[rows] = np.asarray(wignercoeff(prod[rows], xg, sa, sb, lmax_out, grid_token=tok))
    out[idx_live] = res if any_cplx else res.real
    return out
