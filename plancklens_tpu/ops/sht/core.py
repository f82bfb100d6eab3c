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
# a full pipeline touches ~10 distinct (lmax, spin, grid) table sets (T/P filters, QE
# legs at two band limits, the output transform, coarse preconditioner grids). Sets are
# big: at lmax 2048 one f64 set is ~175 MB host-side (alpha/beta/gamma ~34 MB each,
# seed_v ~50 MB, seed_k ~25 MB) and the lazily materialised device flavour doubles
# that, so the cap is a BYTE budget (PLK_TABLE_CACHE_MB, default 1536 — ten f32 sets
# or four f64 sets with their device copies), LRU-evicted, with a secondary count cap
# (PLK_TABLE_CACHE, default 16) against many tiny sets.
_TABLE_CACHE_MAX = int(__import__('os').environ.get('PLK_TABLE_CACHE', 16))
_TABLE_CACHE_MB = float(__import__('os').environ.get('PLK_TABLE_CACHE_MB', 1536))


def _set_nbytes(out):
    """Approximate footprint of one cached table set: host numpy + the device
    flavour that _tabs_for materialises on first eager use."""
    return 2 * sum(v.nbytes for v in out['np'].values())


def clear_cache():
    _TABLE_CACHE.clear()


def _xi_sign(m, n):
    return -1.0 if (m > n and (m - n) % 2 == 1) else 1.0


def _rec_step(l, st, al, bl, gl, xc, l0, sv, sk, thresh, down):
    """One scaled Wigner-d recursion step l -> l+1: seed injection at l+1 == l0(m),
    2^-S down-scaling when |d| crosses thresh, carried exponent count k.

    st = (d_{l-1}, d_l, k); al/bl/gl are (m,) coefficient rows broadcast over the ring
    axis; xc is (rings, 1) cos(theta); sv/sk the (rings, m) seed value/exponent rows.
    THE single XLA implementation, shared by the plain scan, the fused NS-pair scan
    and the blocked analysis (the Pallas kernels carry their own in-kernel copy of
    this step — keep them in sync when touching the rescale/injection logic)."""
    d_m1, d, k = st
    d_next = (al[None, :] * xc + bl[None, :]) * d - gl[None, :] * d_m1
    inject = (l + 1) == l0[None, :]
    d_new = jnp.where(inject, jnp.zeros_like(d), d)
    d_next = jnp.where(inject, sv, d_next)
    k = jnp.where(inject, sk, k)
    cond = (k < 0) & (jnp.abs(d_next) > thresh)
    fac = jnp.where(cond, down, jnp.ones_like(d_next))
    return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)


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
            out = _TABLE_CACHE.pop(key)   # re-insert: LRU order for the byte budget
            _TABLE_CACHE[key] = out
            return out
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
    # rejects programs whose closure constants are committed device arrays).  The dev
    # flavour is materialised lazily on first *eager* use (_tabs_for): jnp arrays built
    # while tracing would be tracers and poison the cache.
    np_tabs = dict(alpha=alpha.astype(dtype), beta=beta.astype(dtype),
                   gamma=gamma.astype(dtype), l0=l0.astype(np.int32),
                   seed_v=seed_v, seed_k=seed_k,
                   x=np.cos(np.asarray(theta, dtype=np.float64)).astype(dtype))
    out = dict(S=S, np={k: v for k, v in np_tabs.items()}, dev=None)
    if key is not None:
        budget = _TABLE_CACHE_MB * 1e6
        total = _set_nbytes(out) + sum(_set_nbytes(o) for o in _TABLE_CACHE.values())
        while _TABLE_CACHE and (len(_TABLE_CACHE) >= _TABLE_CACHE_MAX
                                or total > budget):
            total -= _set_nbytes(_TABLE_CACHE.pop(next(iter(_TABLE_CACHE))))
        _TABLE_CACHE[key] = out
    return out


@partial(jax.jit, static_argnums=(0, 1, 10, 11))
def _legendre_scan(mode, S, C_or_Q, alpha, beta, gamma, l0, seed_v, seed_k, x,
                   mxu=False, chunk=1):
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
        return _rec_step(l, (d_m1, d, k), al, bl, gl, xcol, l0, seed_v, seed_k,
                         thresh, down)

    # l-loop chunking: CHUNK l-steps are unrolled inside each scan step. Default 1 off
    # the MXU path: both the XLA TPU cost model and measured CPU wall time degrade
    # monotonically with chunk size (lmax-512 spin-2 synthesis: 2.0 s at CHUNK=1 vs
    # 22.8 s at the former default 8 on one CPU core; cost-model flops/bytes at lmax
    # 2048: 3.72e10/1.66e10 at 1 vs 4.18e10/1.95e10 at 8 — docs/PERF.md) — the compiler
    # fuses the single-l body into one streaming bundle, while unrolled chunks
    # materialise per-j intermediates. On the MXU path the chunk is the GEMM's
    # l-extent (default 8). Both resolved by _dispatch; see there for the knobs.
    CHUNK = chunk
    # mxu=True: gather the chunk's d-values into an (l, rings, m) stack and do the
    # accumulate as ONE einsum contracting l — a batched-(over m) (batch x l)@(l x rings)
    # GEMM, i.e. MXU-shaped on TPU (BLAS-shaped on CPU) instead of CHUNK sequential
    # multiply-adds on the VPU. Worthwhile once batch reaches GEMM-efficient sizes
    # (production sims batches); at small batch the recursion stream dominates either way
    # (docs/PERF.md roofline). Auto-enabled by batch size in _dispatch.
    MXU = mxu
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
            if MXU:
                dstack = []
                for j in range(CHUNK):
                    dstack.append((d * jnp.exp2((S * k).astype(rdtype))).astype(adtype))
                    d_m1, d, k = recurse(lc[j], d_m1, d, k, alc[j], blc[j], glc[j])
                dmat = jnp.stack(dstack)           # (CHUNK, nrings, m)
                locals_ = tuple(jnp.einsum('lbm,lrm->brm', Cp, dmat) for Cp in Cparts)
            else:
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
            if MXU:
                dstack = []
                for j in range(CHUNK):
                    dstack.append((d * jnp.exp2((S * k).astype(rdtype))).astype(adtype))
                    d_m1, d, k = recurse(lc[j], d_m1, d, k, alc[j], blc[j], glc[j])
                dmat = jnp.stack(dstack)           # (CHUNK, nrings, m)
                return (d_m1, d, k), tuple(jnp.einsum('brm,lrm->lbm', Qp, dmat)
                                           for Qp in Q_parts)
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
    if isinstance(data, jax.core.Tracer):
        return t['np']
    if t['dev'] is None:
        t['dev'] = {k: jnp.asarray(v) for k, v in t['np'].items()}
    return t['dev']


# ---------------------------------------------------------------- north-south symmetry
# On a symmetric grid (theta_{N-1-j} = pi - theta_j: GL, healpix) the mirror identity
# d^l_{m n}(pi - t) = (-1)^{l+m} d^l_{m,-n}(t) lets the recursion run on the northern half
# only: the (+n) recursion provides the southern values of the (-n) transform and vice
# versa (for n = 0, its own). The recursion is the flop-dominant part of the engine
# (~6 ops/point vs 2 per accumulate), so this is the reference's 2x grid trick
# (wigners.f90:187-204) in fused-pair form.

_SYM_CACHE = {}


def _sym_split(theta, grid_token=None):
    """(is_symmetric, nh) with nh = number of northern rings (equator included)."""
    key = ('sym', grid_token) if grid_token is not None else None
    if key is not None and key in _SYM_CACHE:
        return _SYM_CACHE[key]
    th = np.asarray(theta, dtype=np.float64)
    sym = bool(np.allclose(th + th[::-1], np.pi, atol=1e-12))
    out = (sym, (len(th) + 1) // 2)
    if key is not None:
        _SYM_CACHE[key] = out
    return out


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 20, 21, 22))
def _legendre_pair_ns(mode, S, single, nrings, Cp_or_Qp, Cm_or_Qm, sgn_m,
                      a_m, b_m, g_m, l0_m, sv_m, sk_m,
                      a_p, b_p, g_p, l0_p, sv_p, sk_p, x,
                      mxu=False, chunk=1, anal_blk=0):
    """Fused (-n, +n) Legendre transforms on the northern half of a symmetric grid.

    mode 'synth':  Cp (batch, lmax+1, mmax+1) -> Fp (batch, nrings, mmax+1) of the (-n)
                   transform, and Cm -> Fm of the (+n) transform (Cm/Fm absent if single).
    mode 'anal':   Qp (batch, nrings, mmax+1) -> A (batch, lmax+1, mmax+1) of (-n), and
                   Qm -> Bc of (+n).
    Tables *_m belong to n_eff = -n, *_p to +n (aliases of each other when single/n = 0);
    sgn_m = (-1)^m row.
    """
    lmaxp1 = a_m.shape[0]
    nh = x.shape[0]
    n_s = nrings - nh
    mmaxp1 = a_m.shape[1]
    rdtype = sv_m.dtype
    xcol = x.astype(rdtype)[:, None]
    thresh = jnp.asarray(2.0 ** (S // 2), dtype=rdtype)
    down = jnp.asarray(2.0 ** (-S), dtype=rdtype)

    def init_state(l0, sv, sk):
        d_m1 = jnp.zeros((nh, mmaxp1), dtype=rdtype)
        d = jnp.where(l0[None, :] == 0, sv, jnp.zeros((nh, mmaxp1), rdtype))
        k = jnp.where(l0[None, :] == 0, sk, jnp.zeros((nh, mmaxp1), jnp.int32))
        return d_m1, d, k

    def recurse(l, st, al, bl, gl, l0, sv, sk):
        return _rec_step(l, st, al, bl, gl, xcol, l0, sv, sk, thresh, down)

    CHUNK = chunk       # see _legendre_scan / _dispatch
    MXU = mxu
    npad = (-lmaxp1) % CHUNK
    nchunks = (lmaxp1 + npad) // CHUNK

    def pad_l(arr):
        return jnp.pad(arr, ((0, npad),) + ((0, 0),) * (arr.ndim - 1))

    ls = jnp.arange(lmaxp1 + npad, dtype=jnp.int32)
    tabs_m = tuple(pad_l(t) for t in (a_m, b_m, g_m))
    tabs_p = tabs_m if single else tuple(pad_l(t) for t in (a_p, b_p, g_p))
    adtype = jnp.zeros(0, dtype=Cp_or_Qp.dtype).real.dtype
    sgn_m_row = sgn_m.astype(adtype)

    def reshape_chunks(arr):
        return arr.reshape((nchunks, CHUNK) + arr.shape[1:])

    is_cplx = jnp.iscomplexobj(Cp_or_Qp)

    def split_parts(arr):
        return (jnp.real(arr), jnp.imag(arr)) if is_cplx else (arr,)

    def join_parts(parts):
        return parts[0] + 1j * parts[1] if is_cplx else parts[0]

    if mode == 'synth':
        batch = Cp_or_Qp.shape[0]
        Cp_l = pad_l(jnp.moveaxis(Cp_or_Qp, 1, 0))
        Cp_parts = split_parts(Cp_l)
        Cm_parts = () if single else split_parts(pad_l(jnp.moveaxis(Cm_or_Qm, 1, 0)))
        nparts = len(Cp_parts)
        nacc = nparts * 2 * (1 if single else 2)  # (north, south) x parts x (p[, m])
        acc0 = tuple(jnp.zeros((batch, nh, mmaxp1), dtype=adtype) for _ in range(nacc))

        def step_s(carry, xs):
            lc = xs[0]
            am, bm, gm = xs[1:4]
            ap_, bp_, gp_ = xs[4:7]
            Cps = xs[7:7 + nparts]
            Cms = xs[7 + nparts:]
            st_m = carry[:3]
            st_p = carry[3:6]
            accs = list(carry[6:])
            if MXU:
                # stack the chunk's d-values, then contract l with ONE einsum per
                # accumulator — a batched (batch x l)@(l x rings) GEMM (see
                # _legendre_scan; same break-even, docs/PERF.md)
                dm_st, dms_st, dp_st, dps_st = [], [], [], []
                for j in range(CHUNK):
                    sgn_l = jnp.where(lc[j] % 2 == 0, 1., -1.).astype(adtype)
                    dm_eff = (st_m[1] * jnp.exp2((S * st_m[2]).astype(rdtype))) \
                        .astype(adtype)
                    dp_eff = dm_eff if single else \
                        (st_p[1] * jnp.exp2((S * st_p[2]).astype(rdtype))).astype(adtype)
                    dm_st.append(dm_eff)
                    dms_st.append(dp_eff * (sgn_l * sgn_m_row)[None, :])
                    if not single:
                        dp_st.append(dp_eff)
                        dps_st.append(dm_eff * (sgn_l * sgn_m_row)[None, :])
                    st_m = recurse(lc[j], st_m, am[j], bm[j], gm[j], l0_m, sv_m, sk_m)
                    if not single:
                        st_p = recurse(lc[j], st_p, ap_[j], bp_[j], gp_[j],
                                       l0_p, sv_p, sk_p)
                dm_mat, dms_mat = jnp.stack(dm_st), jnp.stack(dms_st)
                a = 0
                for Cp in Cps:
                    accs[a] = accs[a] + jnp.einsum('lbm,lrm->brm', Cp, dm_mat)
                    accs[a + 1] = accs[a + 1] + jnp.einsum('lbm,lrm->brm', Cp, dms_mat)
                    a += 2
                if not single:
                    dp_mat, dps_mat = jnp.stack(dp_st), jnp.stack(dps_st)
                    for Cm in Cms:
                        accs[a] = accs[a] + jnp.einsum('lbm,lrm->brm', Cm, dp_mat)
                        accs[a + 1] = accs[a + 1] + jnp.einsum('lbm,lrm->brm',
                                                               Cm, dps_mat)
                        a += 2
                return st_m + st_p + tuple(accs), None
            for j in range(CHUNK):
                sgn_l = jnp.where(lc[j] % 2 == 0, 1., -1.).astype(adtype)
                dm_eff = (st_m[1] * jnp.exp2((S * st_m[2]).astype(rdtype))).astype(adtype)
                dp_eff = dm_eff if single else \
                    (st_p[1] * jnp.exp2((S * st_p[2]).astype(rdtype))).astype(adtype)
                # southern values of the (-n) transform come from the (+n) recursion
                dm_south = dp_eff * (sgn_l * sgn_m_row)[None, :]
                a = 0
                for Cp in Cps:
                    accs[a] = accs[a] + Cp[j][:, None, :] * dm_eff[None]
                    accs[a + 1] = accs[a + 1] + Cp[j][:, None, :] * dm_south[None]
                    a += 2
                if not single:
                    dp_south = dm_eff * (sgn_l * sgn_m_row)[None, :]
                    for Cm in Cms:
                        accs[a] = accs[a] + Cm[j][:, None, :] * dp_eff[None]
                        accs[a + 1] = accs[a + 1] + Cm[j][:, None, :] * dp_south[None]
                        a += 2
                st_m = recurse(lc[j], st_m, am[j], bm[j], gm[j], l0_m, sv_m, sk_m)
                if not single:
                    st_p = recurse(lc[j], st_p, ap_[j], bp_[j], gp_[j], l0_p, sv_p, sk_p)
            return st_m + st_p + tuple(accs), None

        xs = tuple(reshape_chunks(a) for a in
                   (ls,) + tabs_m + tabs_p + Cp_parts + Cm_parts)
        st0 = init_state(l0_m, sv_m, sk_m) + \
            (init_state(l0_p, sv_p, sk_p) if not single else init_state(l0_m, sv_m, sk_m))
        out = jax.lax.scan(step_s, st0 + acc0, xs)[0]
        accs = out[6:]

        def assemble(acc_n_parts, acc_s_parts):
            F_n = join_parts(acc_n_parts)
            F_s = join_parts(acc_s_parts)
            return jnp.concatenate([F_n, F_s[:, :n_s][:, ::-1]], axis=1)

        if single:
            Fp = assemble(accs[0::2], accs[1::2])
            return Fp, Fp
        accs_p = accs[:2 * nparts]
        accs_m = accs[2 * nparts:]
        Fp = assemble(accs_p[0::2], accs_p[1::2])
        Fm = assemble(accs_m[0::2], accs_m[1::2])
        return Fp, Fm
    else:
        # analysis: fold Q into (north, signed mirrored south) pairs per input
        def fold(Q):
            Qn = Q[:, :nh]
            Qs = Q[:, nrings - 1:nh - 1:-1]  # southern rings in northern (mirror) order
            if n_s < nh:
                Qs = jnp.pad(Qs, ((0, 0), (0, nh - n_s), (0, 0)))
            return Qn, Qs * sgn_m_row[None, None, :]

        Qp_n, Qp_s = fold(Cp_or_Qp)
        Qm_n, Qm_s = (Qp_n, Qp_s) if single else fold(Cm_or_Qm)
        Qp_n_parts, Qp_s_parts = split_parts(Qp_n), split_parts(Qp_s)
        Qm_n_parts, Qm_s_parts = split_parts(Qm_n), split_parts(Qm_s)
        nparts = len(Qp_n_parts)
        batch = Qp_n_parts[0].shape[0]
        nout = nparts * (1 if single else 2)

        def anal_l_scan(Qpn, Qps, Qmn, Qms, x_r, svm, skm, svp, skp):
            """Full l-scan restricted to one set of rings; returns the (nout, lmaxp1,
            batch, m) stacked harmonic rows. Qpn/Qps/Qmn/Qms: tuples of (batch, R, m)
            parts; x_r (R,); sv/sk (R, m) seed rows for those rings."""
            xc = x_r.astype(rdtype)[:, None]
            R = x_r.shape[0]

            def init_st(l0, sv, sk):
                d_m1 = jnp.zeros((R, mmaxp1), dtype=rdtype)
                d = jnp.where(l0[None, :] == 0, sv, jnp.zeros((R, mmaxp1), rdtype))
                k = jnp.where(l0[None, :] == 0, sk, jnp.zeros((R, mmaxp1), jnp.int32))
                return d_m1, d, k

            def rec(l, st, al, bl, gl, l0, sv, sk):
                return _rec_step(l, st, al, bl, gl, xc, l0, sv, sk, thresh, down)

            def step_a(carry, xs):
                lc = xs[0]
                am, bm, gm = xs[1:4]
                ap_, bp_, gp_ = xs[4:7]
                st_m = carry[:3]
                st_p = carry[3:]
                if MXU:
                    # (CHUNK, R, m) d-stacks, then ONE l-batched GEMM per output; the
                    # per-l south sign is folded into the signed southern stack
                    dm_st, dp_st, dms_st, dps_st = [], [], [], []
                    for j in range(CHUNK):
                        sgn_l = jnp.where(lc[j] % 2 == 0, 1., -1.).astype(adtype)
                        dm_eff = (st_m[1] * jnp.exp2((S * st_m[2]).astype(rdtype))) \
                            .astype(adtype)
                        dp_eff = dm_eff if single else \
                            (st_p[1] * jnp.exp2((S * st_p[2]).astype(rdtype))) \
                            .astype(adtype)
                        dm_st.append(dm_eff)
                        dp_st.append(dp_eff)
                        dms_st.append(sgn_l * dm_eff)
                        dps_st.append(sgn_l * dp_eff)
                        st_m = rec(lc[j], st_m, am[j], bm[j], gm[j], l0_m, svm, skm)
                        if not single:
                            st_p = rec(lc[j], st_p, ap_[j], bp_[j], gp_[j],
                                       l0_p, svp, skp)
                    dm_mat, dps_mat = jnp.stack(dm_st), jnp.stack(dps_st)
                    A = tuple(jnp.einsum('brm,lrm->lbm', Qn, dm_mat)
                              + jnp.einsum('brm,lrm->lbm', Qs, dps_mat)
                              for Qn, Qs in zip(Qpn, Qps))
                    if single:
                        return st_m + st_p, A
                    dp_mat, dms_mat = jnp.stack(dp_st), jnp.stack(dms_st)
                    B = tuple(jnp.einsum('brm,lrm->lbm', Qn, dp_mat)
                              + jnp.einsum('brm,lrm->lbm', Qs, dms_mat)
                              for Qn, Qs in zip(Qmn, Qms))
                    return st_m + st_p, A + B
                emits = []
                for j in range(CHUNK):
                    sgn_l = jnp.where(lc[j] % 2 == 0, 1., -1.).astype(adtype)
                    dm_eff = (st_m[1] * jnp.exp2((S * st_m[2]).astype(rdtype))) \
                        .astype(adtype)
                    dp_eff = dm_eff if single else \
                        (st_p[1] * jnp.exp2((S * st_p[2]).astype(rdtype))).astype(adtype)
                    A_l = tuple(jnp.einsum('brm,rm->bm', Qn, dm_eff)
                                + sgn_l * jnp.einsum('brm,rm->bm', Qs, dp_eff)
                                for Qn, Qs in zip(Qpn, Qps))
                    if single:
                        emits.append(A_l)
                    else:
                        B_l = tuple(jnp.einsum('brm,rm->bm', Qn, dp_eff)
                                    + sgn_l * jnp.einsum('brm,rm->bm', Qs, dm_eff)
                                    for Qn, Qs in zip(Qmn, Qms))
                        emits.append(A_l + B_l)
                    st_m = rec(lc[j], st_m, am[j], bm[j], gm[j], l0_m, svm, skm)
                    if not single:
                        st_p = rec(lc[j], st_p, ap_[j], bp_[j], gp_[j], l0_p, svp, skp)
                return st_m + st_p, tuple(jnp.stack([e[i] for e in emits])
                                          for i in range(nout))

            xs = tuple(reshape_chunks(a) for a in (ls,) + tabs_m + tabs_p)
            st0 = init_st(l0_m, svm, skm) + (init_st(l0_p, svp, skp) if not single
                                             else init_st(l0_m, svm, skm))
            _, emits = jax.lax.scan(step_a, st0, xs)
            return tuple(e.reshape((nchunks * CHUNK,) + e.shape[2:])[:lmaxp1]
                         for e in emits)

        # Ring-blocked analysis (PLK_SHT_ANAL_BLOCK rings per block, 0 disables): the
        # per-l contraction above re-streams the full (batch, rings, m) Fourier-mode
        # array every l step — 2.2x the synthesis HBM traffic at lmax 2048
        # (docs/PERF.md). An outer scan over ring blocks carries the C accumulator:
        # inside a block the l-scan touches only that block's (batch, R, m) rows, so
        # the per-step working set is bounded by the block size and the total traffic
        # drops to ~(nblocks x C_out) + (Q once) + (nblocks x recursion tables).
        # Default by backend: small blocks on CPU (the block must fit L2: measured
        # lmax-512 anal wall 2.05 s unblocked -> 1.47 s at 32), larger on TPU (fewer
        # accumulator+table passes; roofline at lmax 2048 puts 256 at ~2.6 GB vs the
        # unblocked 37 GB). Resolved in _anal_block() and passed as a STATIC arg so
        # the jit cache is keyed on it (an env read here would be baked into the
        # first-compiled executable and silently ignored afterwards).
        BLK = anal_blk
        if BLK > 0 and nh > BLK:
            npad_r = (-nh) % BLK
            nblk = (nh + npad_r) // BLK

            def pad_r(arr, fill=0.):
                return jnp.pad(arr, ((0, 0), (0, npad_r), (0, 0)),
                               constant_values=fill)

            def blk(arr):  # (batch, nh+pad, m) -> (nblk, batch, BLK, m)
                a = arr.reshape(arr.shape[0], nblk, BLK, arr.shape[-1])
                return jnp.moveaxis(a, 1, 0)

            def blk_rows(arr):  # (nh+pad, m) -> (nblk, BLK, m)
                return arr.reshape(nblk, BLK, arr.shape[-1])

            # padded rings: zero Q and zero seeds (d stays 0, contributions vanish)
            x_pad = jnp.pad(x, (0, npad_r), constant_values=1.)
            sv_m_p = jnp.pad(sv_m, ((0, npad_r), (0, 0)))
            sk_m_p = jnp.pad(sk_m, ((0, npad_r), (0, 0)))
            sv_p_p = jnp.pad(sv_p, ((0, npad_r), (0, 0)))
            sk_p_p = jnp.pad(sk_p, ((0, npad_r), (0, 0)))
            xs_blocks = (
                tuple(blk(pad_r(q)) for q in Qp_n_parts),
                tuple(blk(pad_r(q)) for q in Qp_s_parts),
                tuple(blk(pad_r(q)) for q in (() if single else Qm_n_parts)),
                tuple(blk(pad_r(q)) for q in (() if single else Qm_s_parts)),
                x_pad.reshape(nblk, BLK),
                blk_rows(sv_m_p), blk_rows(sk_m_p), blk_rows(sv_p_p), blk_rows(sk_p_p))

            def outer(acc, xs_b):
                qpn, qps, qmn, qms, x_b, svm, skm, svp, skp = xs_b
                if single:
                    qmn, qms = qpn, qps
                part = anal_l_scan(qpn, qps, qmn, qms, x_b, svm, skm, svp, skp)
                return tuple(a + p for a, p in zip(acc, part)), None

            acc0 = tuple(jnp.zeros((lmaxp1, batch, mmaxp1), dtype=Qp_n_parts[0].dtype)
                         for _ in range(nout))
            flat, _ = jax.lax.scan(outer, acc0, xs_blocks)
        else:
            flat = anal_l_scan(Qp_n_parts, Qp_s_parts, Qm_n_parts, Qm_s_parts,
                               x, sv_m, sk_m, sv_p, sk_p)
        A = jnp.moveaxis(join_parts(flat[:nparts]), 0, 1)
        if single:
            return A, A
        B = jnp.moveaxis(join_parts(flat[nparts:]), 0, 1)
        return A, B


def _pair_tables(lmax, mmax, spin, theta_half, grid_token, dtype):
    tok = None if grid_token is None else ('ns', grid_token)
    t_m = recursion_tables(lmax, mmax, -spin, theta_half, grid_token=tok, dtype=dtype)
    t_p = t_m if spin == 0 else \
        recursion_tables(lmax, mmax, spin, theta_half, grid_token=tok, dtype=dtype)
    return t_m, t_p


def _run_pair(mode, data_p, data_m, spin, theta, lmax, grid_token, dtype):
    """Dispatch the fused NS-pair scan; data_m may be None (single transform)."""
    nrings = len(np.asarray(theta))
    nh = (nrings + 1) // 2
    theta_half = np.asarray(theta)[:nh]
    mmax = data_p.shape[-1] - 1
    t_m, t_p = _pair_tables(lmax, mmax, spin, theta_half, grid_token, dtype)
    single = data_m is None
    tb_m = _tabs_for(t_m, data_p)
    tb_p = _tabs_for(t_p, data_p)
    sgn_m = np.where(np.arange(mmax + 1) % 2 == 0, 1., -1.)
    dummy = data_p if single else data_m
    mxu, chunk = _dispatch(data_p.shape[0], anal=(mode == 'anal'))
    return _legendre_pair_ns(mode, t_m['S'], single, nrings,
                             jnp.asarray(data_p), jnp.asarray(dummy), sgn_m,
                             tb_m['alpha'], tb_m['beta'], tb_m['gamma'],
                             tb_m['l0'], tb_m['seed_v'], tb_m['seed_k'],
                             tb_p['alpha'], tb_p['beta'], tb_p['gamma'],
                             tb_p['l0'], tb_p['seed_v'], tb_p['seed_k'], tb_m['x'],
                             mxu, chunk, _anal_block() if mode == 'anal' else 0)


def _dispatch(batch, anal=False):
    """(mxu, chunk) for a Legendre call on a `batch` of maps.

    The MXU-shaped accumulate (chunked l-GEMM) is auto-enabled for ANALYSIS once the
    batch reaches GEMM-efficient sizes (batch >= PLK_SHT_MXU_BATCH, default 16):
    measured on the production NS-pair path at lmax 256, analysis wall 8.5 -> 5.9 s
    at batch 32 and 10.4 -> 4.6 s at batch 64 on one CPU core at flop-neutral XLA
    cost (the contraction becomes a BLAS/MXU GEMM instead of VPU multiply-adds).
    Synthesis keeps the streaming CHUNK=1 accumulate: there the d-stack + twin
    north/south einsums RAISE the cost model by ~40% flops/bytes and the measured
    wall by 1.4-5x (docs/PERF.md), so MXU synthesis is opt-in only.
    PLK_SHT_MXU=1/0 forces both directions on/off. The l-chunk is the GEMM's
    l-extent on the MXU path (default 8) and 1 otherwise; PLK_SHT_CHUNK overrides.
    """
    import os
    env = os.environ.get('PLK_SHT_MXU', '')
    if env in ('0', '1'):
        mxu = env == '1'
    else:
        mxu = anal and batch >= int(os.environ.get('PLK_SHT_MXU_BATCH', '16'))
    cenv = os.environ.get('PLK_SHT_CHUNK', '')
    chunk = int(cenv) if cenv else (8 if mxu else 1)
    return mxu, chunk


def _anal_block():
    """Ring-block size for the blocked analysis accumulate (0 disables). Read per
    call and passed to the jitted kernel as a static arg, so changing
    PLK_SHT_ANAL_BLOCK mid-process recompiles instead of silently reusing the
    first-compiled block size."""
    import os
    env = os.environ.get('PLK_SHT_ANAL_BLOCK', '')
    if env:
        return int(env)
    return 32 if jax.default_backend() == 'cpu' else 256


def _ns_enabled():
    return __import__('os').environ.get('PLK_SHT_NS', '1') != '0'


def _pallas_pair_setup(spin, theta, lmax, mmax, grid_token):
    """(t_m, t_p, interpret) for the fused Pallas pair kernels: f32 tables on the
    northern half (the kernels are f32-only, see legendre_synth)."""
    nh = (len(np.asarray(theta)) + 1) // 2
    theta_half = np.asarray(theta)[:nh]
    t_m, t_p = _pair_tables(lmax, mmax, spin, theta_half, grid_token, np.float32)
    return t_m, t_p, jax.default_backend() == 'cpu'


def legendre_synth_pair(Cp, Cm, spin, theta, grid_token=None, dtype=np.float64,
                        engine='xla'):
    """(Fp, Fm) = (sum_l Cp d^l_{m,-spin}, sum_l Cm d^l_{m,+spin}); Cm may be None
    (then Fm is None). Uses the fused north-south path on symmetric grids
    (PLK_SHT_NS=0 disables, falling back to two plain scans); engine='pallas' runs
    the VMEM-resident fused TPU kernel (f32, interpret mode on CPU backends)."""
    sym, _ = _sym_split(theta, grid_token=grid_token)
    if sym and _ns_enabled() and engine == 'pallas':
        from .pallas_kernel import legendre_synth_pair_pallas
        lmax = Cp.shape[-2] - 1
        t_m, t_p, interp = _pallas_pair_setup(spin, theta, lmax, Cp.shape[-1] - 1,
                                              grid_token)
        return legendre_synth_pair_pallas(Cp, Cm, spin, theta, t_m, t_p,
                                          interpret=interp)
    if engine != 'xla' or not sym or not _ns_enabled():
        Fp = legendre_synth(Cp, -spin, theta, grid_token=grid_token, dtype=dtype,
                            engine=engine)
        Fm = None if Cm is None else legendre_synth(Cm, spin, theta,
                                                    grid_token=grid_token, dtype=dtype,
                                                    engine=engine)
        return Fp, Fm
    lmax = Cp.shape[-2] - 1
    Fp, Fm = _run_pair('synth', Cp, Cm, spin, theta, lmax, grid_token, dtype)
    return Fp, (None if Cm is None else Fm)


def legendre_anal_pair(Qp, Qm, spin, theta, lmax, grid_token=None, dtype=np.float64,
                       engine='xla'):
    """(A, Bc) = (sum_j Qp d^l_{m,-spin}, sum_j Qm d^l_{m,+spin}); Qm may be None.
    engine='pallas' runs the VMEM-resident fused TPU kernel on symmetric grids."""
    sym, _ = _sym_split(theta, grid_token=grid_token)
    if sym and _ns_enabled() and engine == 'pallas':
        from .pallas_kernel import legendre_anal_pair_pallas
        t_m, t_p, interp = _pallas_pair_setup(spin, theta, lmax, Qp.shape[-1] - 1,
                                              grid_token)
        return legendre_anal_pair_pallas(Qp, Qm, spin, theta, lmax, t_m, t_p,
                                         interpret=interp)
    if engine != 'xla' or not sym or not _ns_enabled():
        A = legendre_anal(Qp, -spin, theta, lmax, grid_token=grid_token, dtype=dtype,
                          engine=engine)
        B = None if Qm is None else legendre_anal(Qm, spin, theta, lmax,
                                                  grid_token=grid_token, dtype=dtype,
                                                  engine=engine)
        return A, B
    A, B = _run_pair('anal', Qp, Qm, spin, theta, lmax, grid_token, dtype)
    return A, (None if Qm is None else B)


def legendre_synth(C, n, theta, grid_token=None, dtype=np.float64, engine='xla'):
    """G_{jm} = sum_l C_{lm} d^l_{m,n}(theta_j); C (batch, lmax+1, mmax+1) complex or real.

    engine='pallas' uses the VMEM-resident TPU kernel (f32; runs in interpret mode
    automatically on CPU backends)."""
    lmax = C.shape[-2] - 1
    mmax = C.shape[-1] - 1
    if engine == 'pallas':
        # the kernel is f32-only: f64 tables carry an S scaling sized to the f64
        # exponent range, whose seed values overflow to inf when cast to f32
        from .pallas_kernel import legendre_synth_pallas
        t = recursion_tables(lmax, mmax, n, theta, grid_token=grid_token,
                             dtype=np.float32)
        interp = jax.default_backend() == 'cpu'
        return legendre_synth_pallas(C, t, np.cos(np.asarray(theta)), interpret=interp)
    t = recursion_tables(lmax, mmax, n, theta, grid_token=grid_token, dtype=dtype)
    tb = _tabs_for(t, C)
    mxu, chunk = _dispatch(C.shape[0])
    return _legendre_scan('synth', t['S'], jnp.asarray(C), tb['alpha'], tb['beta'],
                          tb['gamma'], tb['l0'], tb['seed_v'], tb['seed_k'], tb['x'],
                          mxu=mxu, chunk=chunk)


def legendre_anal(Q, n, theta, lmax, grid_token=None, dtype=np.float64, engine='xla'):
    """C_{lm} = sum_j Q_{jm} d^l_{m,n}(theta_j); Q (batch, nrings, mmax+1).

    engine='pallas' uses the VMEM-resident TPU kernel (f32; interpret mode on CPU)."""
    mmax = Q.shape[-1] - 1
    if engine == 'pallas':
        # f32 tables required — see legendre_synth
        from .pallas_kernel import legendre_anal_pallas
        t = recursion_tables(lmax, mmax, n, theta, grid_token=grid_token,
                             dtype=np.float32)
        interp = jax.default_backend() == 'cpu'
        return legendre_anal_pallas(Q, t, np.cos(np.asarray(theta)), lmax,
                                    interpret=interp)
    t = recursion_tables(lmax, mmax, n, theta, grid_token=grid_token, dtype=dtype)
    tb = _tabs_for(t, Q)
    mxu, chunk = _dispatch(Q.shape[0], anal=True)
    return _legendre_scan('anal', t['S'], jnp.asarray(Q), tb['alpha'], tb['beta'],
                          tb['gamma'], tb['l0'], tb['seed_v'], tb['seed_k'], tb['x'],
                          mxu=mxu, chunk=chunk)
