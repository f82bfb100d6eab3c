r"""Core spin-weighted Legendre engine.

Computes, for all m >= 0 and all rings theta_j simultaneously,

    synthesis:  G_{jm} = sum_l C_{lm} d^l_{m,n}(theta_j)
    analysis:   C_{lm} = sum_j Q_{jm} d^l_{m,n}(theta_j)

via a single `lax.scan` over l running the Wigner-d three-term recursion, vectorised over
(rings x m) and batched over fields. The spin-weighted spherical harmonics are
_sY_lm = sqrt((2l+1)/4pi) d^l_{m,-s}(theta) e^{im phi}, so these two primitives plus ring
FFTs implement spin-s SHTs on any iso-latitude grid.

This is the TPU replacement for the per-ring OpenMP recursions inside healpy/libsharp
(reference dispatch: plancklens/shts.py). Numerical stability at high m follows the
libsharp approach: the recursion state carries a per-(ring, m) power-of-2^S exponent so
sin^m(theta/2)-type underflow in the seed value is represented exactly and values
re-entering the dynamic range are recovered ("scaled recursion").
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from scipy.special import gammaln

_TABLE_CACHE = {}
_TABLE_CACHE_MAX = 8


def clear_cache():
    _TABLE_CACHE.clear()


def _xi_sign(m, n):
    return -1.0 if (m > n and (m - n) % 2 == 1) else 1.0


def recursion_tables(lmax, mmax, n, theta, grid_token=None, dtype=np.float64):
    """Per-(l, m) recursion coefficients and scaled seed values for d^l_{m, n}(theta).

    Returns dict with:
      alpha, beta, gamma: (lmax+1, mmax+1) float arrays; step l -> l+1 reads row l
      l0:       (mmax+1,) int32, first nonzero degree max(m, |n|)
      seed_v:   (nrings, mmax+1) scaled seed value at l = l0(m)
      seed_k:   (nrings, mmax+1) int32 exponent: true seed = seed_v * 2^(S k)
      S:        exponent chunk size
    """
    key = None
    if grid_token is not None:
        key = (lmax, mmax, n, grid_token, np.dtype(dtype).str)
        if key in _TABLE_CACHE:
            return _TABLE_CACHE[key]
    ls = np.arange(lmax + 1, dtype=np.float64)[:, None]
    ms = np.arange(mmax + 1, dtype=np.float64)[None, :]
    l0 = np.maximum(np.abs(n), np.arange(mmax + 1)).astype(np.int64)
    with np.errstate(divide='ignore', invalid='ignore'):
        D = ls * np.sqrt(((ls + 1.) ** 2 - ms ** 2) * ((ls + 1.) ** 2 - float(n) ** 2))
        alpha = (2. * ls + 1.) * ls * (ls + 1.) / D
        beta = -(2. * ls + 1.) * ms * float(n) / D
        gamma = (ls + 1.) * np.sqrt((ls ** 2 - ms ** 2) * (ls ** 2 - float(n) ** 2)) / D
    # rows below l0(m) - and the l = 0 row when l0 = 0 - are never used meaningfully;
    # zero them (the l0=0, l=0 case is the Legendre start d^1_00 = x d^0_00)
    invalid = ls < np.maximum(l0[None, :], 1)
    for arr, fill in ((alpha, 0.), (beta, 0.), (gamma, 0.)):
        arr[invalid] = fill
        arr[~np.isfinite(arr)] = 0.
    if n == 0 and mmax >= 0:
        # explicit l=0 step for the m=0 Legendre branch: d^1 = x d^0
        if l0[0] == 0:
            alpha[0, 0] = 1.
            beta[0, 0] = 0.
            gamma[0, 0] = 0.

    # scaled seeds: d^{l0}_{m n} = xi sqrt(binom(a+b, a)) sin^a(theta/2) cos^b(theta/2)
    S = 256 if np.dtype(dtype) == np.float64 else 64
    a = np.abs(ms - n)
    b = np.abs(ms + n)
    lnr0 = 0.5 * (gammaln(a + b + 1.) - gammaln(a + 1.) - gammaln(b + 1.))
    lnsin = np.log(np.sin(0.5 * np.asarray(theta, dtype=np.float64)))[:, None]
    lncos = np.log(np.cos(0.5 * np.asarray(theta, dtype=np.float64)))[:, None]
    log2v = (lnr0 + a * lnsin + b * lncos) / np.log(2.)
    xi = np.array([_xi_sign(int(m), n) for m in range(mmax + 1)])[None, :]
    seed_k = np.minimum(np.floor(log2v / S), 0.).astype(np.int32)
    seed_v = (xi * np.exp2(log2v - S * seed_k.astype(np.float64))).astype(dtype)
    # two flavours of every table: device-resident arrays for eager calls (passed as
    # arguments to the inner jit, avoiding re-upload per call) and host numpy for calls
    # made inside an enclosing trace (embedded as constants: the axon TPU runtime
    # rejects programs whose closure constants are committed device arrays)
    np_tabs = dict(alpha=alpha.astype(dtype), beta=beta.astype(dtype),
                   gamma=gamma.astype(dtype), l0=l0.astype(np.int32),
                   seed_v=seed_v, seed_k=seed_k,
                   x=np.cos(np.asarray(theta, dtype=np.float64)).astype(dtype))
    out = dict(S=S, np={k: v for k, v in np_tabs.items()},
               dev={k: jnp.asarray(v) for k, v in np_tabs.items()})
    if key is not None:
        if len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[key] = out
    return out


@partial(jax.jit, static_argnums=(0, 1))
def _legendre_scan(mode, S, C_or_Q, alpha, beta, gamma, l0, seed_v, seed_k, x):
    """Scan over l of the scaled d-recursion.

    mode 'synth':  C_or_Q (batch, lmax+1, mmax+1) -> G (batch, nrings, mmax+1)
    mode 'anal':   C_or_Q (batch, nrings, mmax+1) -> C (batch, lmax+1, mmax+1)
    x: (nrings,) = cos(theta). All d-state in the dtype of seed_v.
    """
    lmaxp1 = alpha.shape[0]
    nrings = x.shape[0]
    mmaxp1 = alpha.shape[1]
    rdtype = seed_v.dtype
    batch = C_or_Q.shape[0]
    xcol = x.astype(rdtype)[:, None]
    thresh = jnp.asarray(2.0 ** (S // 2), dtype=rdtype)
    down = jnp.asarray(2.0 ** (-S), dtype=rdtype)

    d_m1 = jnp.zeros((nrings, mmaxp1), dtype=rdtype)
    d = jnp.where(l0[None, :] == 0, seed_v, jnp.zeros((nrings, mmaxp1), rdtype))
    k = jnp.where(l0[None, :] == 0, seed_k, jnp.zeros((nrings, mmaxp1), jnp.int32))

    def recurse(l, d_m1, d, k, al, bl, gl):
        """One scaled recursion step l -> l+1 with seed injection at l+1 == l0(m)."""
        d_next = (al[None, :] * xcol + bl[None, :]) * d - gl[None, :] * d_m1
        inject = (l + 1) == l0[None, :]
        d_new = jnp.where(inject, jnp.zeros_like(d), d)
        d_next = jnp.where(inject, seed_v, d_next)
        k = jnp.where(inject, seed_k, k)
        cond = (k < 0) & (jnp.abs(d_next) > thresh)
        fac = jnp.where(cond, down, jnp.ones_like(d_next))
        return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)

    # chunk the l loop: the recursion state stays register/VMEM-resident across CHUNK
    # steps and the large (batch, nrings, m) accumulator is read/written once per chunk
    # instead of once per l — the accumulator's HBM traffic dominates otherwise
    CHUNK = int(__import__('os').environ.get('PLK_SHT_CHUNK', 8))  # perf knob
    npad = (-lmaxp1) % CHUNK
    nchunks = (lmaxp1 + npad) // CHUNK

    def pad_l(arr):
        return jnp.pad(arr, ((0, npad),) + ((0, 0),) * (arr.ndim - 1))

    ls = jnp.arange(lmaxp1 + npad, dtype=jnp.int32)  # padded l >= lmaxp1 contribute 0
    alpha_p, beta_p, gamma_p = pad_l(alpha), pad_l(beta), pad_l(gamma)
    adtype = jnp.zeros(0, dtype=C_or_Q.dtype).real.dtype

    def reshape_chunks(arr):
        return arr.reshape((nchunks, CHUNK) + arr.shape[1:])

    # complex arrays are kept out of the scan carry/xs (split into real pairs): the
    # axon TPU runtime rejects scans carrying complex accumulators when the scan is
    # inlined into a larger jitted program
    is_cplx = jnp.iscomplexobj(C_or_Q)
    if mode == 'synth':
        C_l = pad_l(jnp.moveaxis(C_or_Q, 1, 0))  # (lmax+1+pad, batch, mmaxp1)
        C_parts = (jnp.real(C_l), jnp.imag(C_l)) if is_cplx else (C_l,)
        acc0 = tuple(jnp.zeros((batch, nrings, mmaxp1), dtype=adtype)
                     for _ in C_parts)

        def step_s(carry, xs):
            lc, alc, blc, glc = xs[:4]
            Cparts = xs[4:]
            d_m1, d, k = carry[:3]
            accs = carry[3:]
            locals_ = tuple(jnp.zeros(a.shape, dtype=a.dtype) for a in accs)
            for j in range(CHUNK):
                deff = (d * jnp.exp2((S * k).astype(rdtype))).astype(adtype)
                locals_ = tuple(loc + Cp[j][:, None, :] * deff[None, :, :]
                                for loc, Cp in zip(locals_, Cparts))
                d_m1, d, k = recurse(lc[j], d_m1, d, k, alc[j], blc[j], glc[j])
            return (d_m1, d, k) + tuple(a + l_ for a, l_ in zip(accs, locals_)), None

        xs = tuple(reshape_chunks(a) for a in (ls, alpha_p, beta_p, gamma_p) + C_parts)
        out, _ = jax.lax.scan(step_s, (d_m1, d, k) + acc0, xs)
        accs = out[3:]
        return accs[0] + 1j * accs[1] if is_cplx else accs[0]
    else:
        Q = C_or_Q  # (batch, nrings, mmaxp1)
        Q_parts = (jnp.real(Q), jnp.imag(Q)) if is_cplx else (Q,)

        def step_a(carry, xs):
            lc, alc, blc, glc = xs
            d_m1, d, k = carry
            emits = []
            for j in range(CHUNK):
                deff = (d * jnp.exp2((S * k).astype(rdtype))).astype(adtype)
                emits.append(tuple(jnp.einsum('brm,rm->bm', Qp, deff)
                                   for Qp in Q_parts))
                d_m1, d, k = recurse(lc[j], d_m1, d, k, alc[j], blc[j], glc[j])
            return (d_m1, d, k), tuple(jnp.stack([e[i] for e in emits])
                                       for i in range(len(Q_parts)))

        xs = tuple(reshape_chunks(a) for a in (ls, alpha_p, beta_p, gamma_p))
        _, emits = jax.lax.scan(step_a, (d_m1, d, k), xs)
        outs = tuple(e.reshape((nchunks * CHUNK,) + e.shape[2:])[:lmaxp1] for e in emits)
        out = outs[0] + 1j * outs[1] if is_cplx else outs[0]
        return jnp.moveaxis(out, 0, 1)  # (batch, lmax+1, mmaxp1)


def _tabs_for(t, data):
    """Numpy tables when tracing (safe closure constants), device tables eagerly."""
    import jax.core
    flavour = 'np' if isinstance(data, jax.core.Tracer) else 'dev'
    return t[flavour]


def legendre_synth(C, n, theta, grid_token=None, dtype=np.float64, engine='xla'):
    """G_{jm} = sum_l C_{lm} d^l_{m,n}(theta_j); C (batch, lmax+1, mmax+1) complex or real.

    engine='pallas' uses the VMEM-resident TPU kernel (f32; runs in interpret mode
    automatically on CPU backends)."""
    lmax = C.shape[-2] - 1
    mmax = C.shape[-1] - 1
    t = recursion_tables(lmax, mmax, n, theta, grid_token=grid_token, dtype=dtype)
    if engine == 'pallas':
        from .pallas_kernel import legendre_synth_pallas
        interp = jax.default_backend() == 'cpu'
        return legendre_synth_pallas(C, t, np.cos(np.asarray(theta)), interpret=interp)
    tb = _tabs_for(t, C)
    return _legendre_scan('synth', t['S'], jnp.asarray(C), tb['alpha'], tb['beta'],
                          tb['gamma'], tb['l0'], tb['seed_v'], tb['seed_k'], tb['x'])


def legendre_anal(Q, n, theta, lmax, grid_token=None, dtype=np.float64, engine='xla'):
    """C_{lm} = sum_j Q_{jm} d^l_{m,n}(theta_j); Q (batch, nrings, mmax+1).

    engine='pallas' uses the VMEM-resident TPU kernel (f32; interpret mode on CPU)."""
    mmax = Q.shape[-1] - 1
    t = recursion_tables(lmax, mmax, n, theta, grid_token=grid_token, dtype=dtype)
    if engine == 'pallas':
        from .pallas_kernel import legendre_anal_pallas
        interp = jax.default_backend() == 'cpu'
        return legendre_anal_pallas(Q, t, np.cos(np.asarray(theta)), lmax, interpret=interp)
    tb = _tabs_for(t, Q)
    return _legendre_scan('anal', t['S'], jnp.asarray(Q), tb['alpha'], tb['beta'],
                          tb['gamma'], tb['l0'], tb['seed_v'], tb['seed_k'], tb['x'])
