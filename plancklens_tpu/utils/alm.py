"""Harmonic-coefficient (alm) array layout and algebra, JAX-native.

Layout convention is the healpy triangular complex storage for m >= 0:
index(l, m) = m (2 lmax + 1 - m) / 2 + l, size = (lmax+1)(lmax+2)/2, so downstream users of the
reference find identical array semantics (reference: plancklens/utils.py:19-69 for
alm_copy / alm2rlm / rlm2alm behaviour).

For TPU compute, alms are reshaped to a dense zero-padded (lmax+1, mmax+1) complex matrix
(`alm2lm` / `lm2alm`): rectangular, statically shaped, batched-matmul friendly. All functions
accept leading batch dimensions.
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def getsize(lmax, mmax=None):
    mmax = lmax if mmax is None else mmax
    return ((mmax + 1) * (mmax + 2)) // 2 + (mmax + 1) * (lmax - mmax)


def getlmax(size, mmax=None):
    """lmax for a given triangular-array size (mmax == lmax assumed if mmax is None)."""
    if mmax is not None and mmax >= 0:
        x = (2 * size + mmax ** 2 + mmax - 2) / (2 * mmax + 2)
    else:
        x = (-3 + np.sqrt(1 + 8 * size)) / 2
    if x != np.floor(x):
        return -1
    return int(x)


def getidx(lmax, l, m):
    return m * (2 * lmax + 1 - m) // 2 + l


def _lm_indices(lmax, mmax=None):
    """(l, m) integer arrays indexed by triangular position."""
    mmax = lmax if mmax is None else mmax
    ls = np.concatenate([np.arange(m, lmax + 1) for m in range(mmax + 1)])
    ms = np.concatenate([np.full(lmax + 1 - m, m) for m in range(mmax + 1)])
    return ls, ms


@partial(jax.jit, static_argnums=(1,))
def almxfl(alm, lmax, fl):
    """Multiply alm by the l-dependent array fl (fl length >= lmax+1)."""
    ls, _ = _lm_indices(lmax)
    return alm * fl[..., ls]


@partial(jax.jit, static_argnums=(1,))
def alm2cl(alm, lmax, alm2=None):
    """Power spectrum 1/(2l+1) sum_m alm alm2^*; real part, healpy convention."""
    if alm2 is None:
        alm2 = alm
    ls, ms = _lm_indices(lmax)
    prod = (alm * jnp.conj(alm2)).real
    w = jnp.where(ms == 0, 1.0, 2.0).astype(prod.dtype)
    cl = jnp.zeros(alm.shape[:-1] + (lmax + 1,), dtype=prod.dtype)
    cl = cl.at[..., ls].add(prod * w)
    return cl / (2. * jnp.arange(lmax + 1) + 1.)


def alm_copy(alm, lmax_in, lmax_out):
    """Truncate/zero-pad an alm array to a new lmax (reference: plancklens/utils.py:19-35)."""
    if lmax_out == lmax_in:
        return jnp.asarray(alm)
    ls_o, ms_o = _lm_indices(lmax_out)
    valid = (ls_o <= lmax_in) & (ms_o <= lmax_in)
    idx_in = np.where(valid, getidx(lmax_in, np.minimum(ls_o, lmax_in), np.minimum(ms_o, lmax_in)), 0)
    out = jnp.asarray(alm)[..., idx_in] * jnp.asarray(valid, dtype=alm.dtype)
    return out


def alm_splice(alm_lo, alm_hi, lsplit):
    """Merge two alm arrays: coefficients of `alm_lo` at l <= lsplit, of `alm_hi` above
    (reference: plancklens/qcinv/util_alm.py:8-24; used to splice coarse/fine solutions).
    The output carries the band limit of `alm_hi`."""
    alm_hi = jnp.asarray(alm_hi)
    lmax_hi = getlmax(alm_hi.shape[-1])
    lmax_lo = getlmax(jnp.asarray(alm_lo).shape[-1])
    lo = alm_copy(jnp.asarray(alm_lo), lmax_lo, lmax_hi)
    ls, _ = _lm_indices(lmax_hi)
    return jnp.where(np.asarray(ls) <= lsplit, lo, alm_hi)


@partial(jax.jit, static_argnums=(1,))
def alm2lm(alm, lmax):
    """Triangular alm -> dense (..., lmax+1, lmax+1) zero-padded (l, m) matrix."""
    ls, ms = _lm_indices(lmax)
    out = jnp.zeros(alm.shape[:-1] + (lmax + 1, lmax + 1), dtype=alm.dtype)
    return out.at[..., ls, ms].set(alm)


@partial(jax.jit, static_argnums=(1,))
def lm2alm(lm, lmax):
    """Dense (l, m) matrix -> triangular alm array."""
    ls, ms = _lm_indices(lmax)
    return lm[..., ls, ms]


def alm2rlm(alm, lmax):
    """Real-valued packing of a complex alm array (reference: plancklens/utils.py:37-54)."""
    alm = jnp.asarray(alm)
    rlm = jnp.zeros(alm.shape[:-1] + ((lmax + 1) ** 2,), dtype=alm.real.dtype)
    ls = np.arange(lmax + 1)
    rlm = rlm.at[..., ls ** 2].set(alm[..., ls].real)
    rt2 = np.sqrt(2.)
    for m in range(1, lmax + 1):
        ls = np.arange(m, lmax + 1)
        idx = getidx(lmax, ls, m)
        rlm = rlm.at[..., ls ** 2 + 2 * m - 1].set(alm[..., idx].real * rt2)
        rlm = rlm.at[..., ls ** 2 + 2 * m].set(alm[..., idx].imag * rt2)
    return rlm


def rlm2alm(rlm, lmax):
    """Inverse of :func:`alm2rlm` (reference: plancklens/utils.py:56-69)."""
    rlm = jnp.asarray(rlm)
    cdtype = jnp.complex128 if rlm.dtype == jnp.float64 else jnp.complex64
    alm = jnp.zeros(rlm.shape[:-1] + (getsize(lmax),), dtype=cdtype)
    ls = np.arange(lmax + 1, dtype=int)
    alm = alm.at[..., ls].set(rlm[..., ls ** 2])
    irt2 = 1. / np.sqrt(2.)
    for m in range(1, lmax + 1):
        ls = np.arange(m, lmax + 1)
        idx = getidx(lmax, ls, m)
        alm = alm.at[..., idx].set((rlm[..., ls ** 2 + 2 * m - 1]
                                    + 1j * rlm[..., ls ** 2 + 2 * m]) * irt2)
    return alm
