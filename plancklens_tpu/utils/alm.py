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
        # invert size = (mmax+1)(mmax+2)/2 + (mmax+1)(lmax - mmax)
        x = (2 * size + mmax ** 2 - mmax - 2) / (2 * mmax + 2)
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


_RLM_MAPS = {}


def _rlm_maps(lmax):
    """Precomputed index maps between the triangular complex layout and the real (rlm)
    packing: rlm index l^2 <-> a_l0 (real); l^2+2m-1 / l^2+2m <-> sqrt(2) Re / Im a_lm."""
    if lmax in _RLM_MAPS:
        return _RLM_MAPS[lmax]
    nr = (lmax + 1) ** 2
    src = np.zeros(nr, dtype=np.int64)      # triangular index feeding each rlm slot
    imag = np.zeros(nr, dtype=bool)         # take the imaginary part
    scale = np.ones(nr)
    ls0 = np.arange(lmax + 1)
    src[ls0 ** 2] = ls0                     # (l, 0)
    rt2 = np.sqrt(2.)
    for m in range(1, lmax + 1):
        lm = np.arange(m, lmax + 1)
        ti = getidx(lmax, lm, m)
        src[lm ** 2 + 2 * m - 1] = ti
        scale[lm ** 2 + 2 * m - 1] = rt2
        src[lm ** 2 + 2 * m] = ti
        imag[lm ** 2 + 2 * m] = True
        scale[lm ** 2 + 2 * m] = rt2
    # inverse: for each triangular index, the rlm slots of its real and imag parts
    ls, ms = _lm_indices(lmax)
    re_idx = np.where(ms == 0, ls ** 2, ls ** 2 + 2 * ms - 1)
    im_idx = np.where(ms == 0, ls ** 2, ls ** 2 + 2 * ms)   # dummy for m = 0
    has_im = (ms > 0).astype(float)
    inv_scale = np.where(ms == 0, 1., 1. / rt2)
    maps = (src, imag, scale, re_idx, im_idx, has_im, inv_scale)
    if len(_RLM_MAPS) > 32:
        _RLM_MAPS.pop(next(iter(_RLM_MAPS)))
    _RLM_MAPS[lmax] = maps
    return maps


def alm2rlm(alm, lmax):
    """Real-valued packing of a complex alm array (reference: plancklens/utils.py:37-54);
    one gather instead of a per-m scatter loop."""
    alm = jnp.asarray(alm)
    src, imag, scale, *_ = _rlm_maps(lmax)
    g = alm[..., src]
    return jnp.where(imag, g.imag, g.real) * jnp.asarray(scale, dtype=alm.real.dtype)


def rlm2alm(rlm, lmax):
    """Inverse of :func:`alm2rlm` (reference: plancklens/utils.py:56-69)."""
    rlm = jnp.asarray(rlm)
    cdtype = jnp.complex128 if rlm.dtype == jnp.float64 else jnp.complex64
    _, _, _, re_idx, im_idx, has_im, inv_scale = _rlm_maps(lmax)
    re = rlm[..., re_idx]
    im = rlm[..., im_idx] * jnp.asarray(has_im, dtype=rlm.dtype)
    return ((re + 1j * im) * inv_scale).astype(cdtype)
