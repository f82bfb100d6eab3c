r"""Pallas TPU kernels for the spin-weighted Legendre phase.

The XLA scan path (core.py) streams its recursion state and accumulator through HBM every
few multipoles; these kernels keep everything VMEM-resident: grid over (batch-tiles,
m-tiles, ring-tiles, l-chunks), the d-recursion state carried in VMEM scratch across
l-chunks, and the output tiles accumulated in VMEM with one HBM write at the end — the
Legendre phase then runs at VPU compute speed instead of HBM bandwidth.

Two generations:
  * the PLAIN kernels (_synth_pallas/_anal_pallas): one transform, full ring grid —
    kept as the fallback for asymmetric grids;
  * the fused NORTH-SOUTH PAIR kernels (_synth_pair_pallas/_anal_pair_pallas): the
    production TPU path. On a symmetric grid (GL, healpix) they run the (-n) and (+n)
    recursions on the northern half only and obtain the southern values from the mirror
    identity d^l_{m n}(pi - t) = (-1)^{l+m} d^l_{m,-n}(t) — the same fusion as the XLA
    pair scan (core._legendre_pair_ns) and the reference's 2x grid trick
    (plancklens/wigners/wigners.f90:187-204). Complex inputs are folded into the batch
    axis (the d-matrix is real), so everything inside the kernel is f32.

HBM traffic (the design point — the XLA analysis path streams 37 GB/map at lmax 2048,
docs/PERF.md): synthesis re-reads the (l, batch, m) coefficients once per RING TILE and
analysis re-reads the (batch, ring, m) Fourier modes once per L CHUNK; both are
tile-size-bounded (PLK_PALLAS_RT / PLK_PALLAS_LC) instead of per-multipole. The honest
flop/byte totals are attached to every pallas_call as a pl.CostEstimate (and exposed as
synth_pair_cost / anal_pair_cost for the bench).
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _synth_kernel(S, LC, alpha_ref, beta_ref, gamma_ref, l0_ref,
                  seedv_ref, seedk_ref, x_ref, cre_ref, cim_ref,
                  ore_ref, oim_ref, dm1_ref, d_ref, k_ref):
    lchunk = pl.program_id(2)

    @pl.when(lchunk == 0)
    def _():
        # (re)initialise state and output tile for this (m, r) tile
        l0 = l0_ref[0, :]
        seedv = seedv_ref[:, :]
        seedk = seedk_ref[:, :]
        init = (l0 == 0)[None, :]
        d_ref[:, :] = jnp.where(init, seedv, 0.)
        k_ref[:, :] = jnp.where(init, seedk, 0)
        dm1_ref[:, :] = jnp.zeros_like(seedv)
        ore_ref[:, :, :] = jnp.zeros_like(ore_ref)
        oim_ref[:, :, :] = jnp.zeros_like(oim_ref)

    x = x_ref[:, 0][:, None]          # (R_T, 1)
    l0 = l0_ref[0, :][None, :]        # (1, M_T)
    seedv = seedv_ref[:, :]
    seedk = seedk_ref[:, :]
    thresh = 2.0 ** (S // 2)
    down = 2.0 ** (-S)

    def body(j, state):
        dm1, d, k = state
        deff = d * jnp.exp2((S * k).astype(d.dtype))
        ore_ref[:, :, :] += cre_ref[j, :, :][:, None, :] * deff[None, :, :]
        oim_ref[:, :, :] += cim_ref[j, :, :][:, None, :] * deff[None, :, :]
        al = alpha_ref[j, :][None, :]
        bl = beta_ref[j, :][None, :]
        gl = gamma_ref[j, :][None, :]
        l = lchunk * LC + j
        d_next = (al * x + bl) * d - gl * dm1
        inject = (l + 1) == l0
        d_new = jnp.where(inject, 0., d)
        d_next = jnp.where(inject, seedv, d_next)
        k = jnp.where(inject, seedk, k)
        cond = (k < 0) & (jnp.abs(d_next) > thresh)
        fac = jnp.where(cond, down, 1.)
        return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)

    dm1, d, k = jax.lax.fori_loop(0, LC, body,
                                  (dm1_ref[:, :], d_ref[:, :], k_ref[:, :]))
    dm1_ref[:, :] = dm1
    d_ref[:, :] = d
    k_ref[:, :] = k


@partial(jax.jit, static_argnums=(0, 10))
def _synth_pallas(S, alpha, beta, gamma, l0, seed_v, seed_k, x, C_re, C_im, interpret=False):
    """(B, R, M) real/imag G from (lmax+1, B, M) C coefficient arrays (all f32)."""
    lmaxp1, B, M = C_re.shape
    R = x.shape[0]
    M_T = 128
    R_T = 128
    LC = 128
    mt = -(-M // M_T)
    rt = -(-R // R_T)
    lt = -(-lmaxp1 // LC)
    Mp, Rp, Lp = mt * M_T, rt * R_T, lt * LC

    def padto(a, shape):
        pads = [(0, s - d) for d, s in zip(a.shape, shape)]
        return jnp.pad(a, pads)

    alpha = padto(alpha, (Lp, Mp))
    beta = padto(beta, (Lp, Mp))
    gamma = padto(gamma, (Lp, Mp))
    l0p = padto(l0.astype(jnp.int32)[None, :], (1, Mp)) + jnp.where(
        jnp.arange(Mp) >= M, jnp.int32(2 * Lp + 10), 0)[None, :]  # never seed padding
    seed_v = padto(seed_v, (Rp, Mp))
    seed_k = padto(seed_k, (Rp, Mp))
    xp = padto(x[:, None], (Rp, 1))
    C_re = padto(C_re, (Lp, B, Mp))
    C_im = padto(C_im, (Lp, B, Mp))

    grid = (mt, rt, lt)
    kernel = partial(_synth_kernel, S, LC)
    out_shape = [jax.ShapeDtypeStruct((B, Rp, Mp), jnp.float32),
                 jax.ShapeDtypeStruct((B, Rp, Mp), jnp.float32)]
    in_specs = [
        pl.BlockSpec((LC, M_T), lambda m, r, l: (l, m)),           # alpha
        pl.BlockSpec((LC, M_T), lambda m, r, l: (l, m)),           # beta
        pl.BlockSpec((LC, M_T), lambda m, r, l: (l, m)),           # gamma
        pl.BlockSpec((1, M_T), lambda m, r, l: (0, m)),            # l0
        pl.BlockSpec((R_T, M_T), lambda m, r, l: (r, m)),          # seed_v
        pl.BlockSpec((R_T, M_T), lambda m, r, l: (r, m)),          # seed_k
        pl.BlockSpec((R_T, 1), lambda m, r, l: (r, 0)),            # x
        pl.BlockSpec((LC, B, M_T), lambda m, r, l: (l, 0, m)),     # C_re
        pl.BlockSpec((LC, B, M_T), lambda m, r, l: (l, 0, m)),     # C_im
    ]
    out_specs = [pl.BlockSpec((B, R_T, M_T), lambda m, r, l: (0, r, m)),
                 pl.BlockSpec((B, R_T, M_T), lambda m, r, l: (0, r, m))]
    ore, oim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R_T, M_T), jnp.float32),
                        pltpu.VMEM((R_T, M_T), jnp.float32),
                        pltpu.VMEM((R_T, M_T), jnp.int32)],
        interpret=interpret,
    )(alpha, beta, gamma, l0p, seed_v, seed_k, xp, C_re, C_im)
    return ore[:, :R, :M], oim[:, :R, :M]


def legendre_synth_pallas(C, tables, x, interpret=False):
    """Drop-in synthesis using the Pallas kernel; C (batch, lmax+1, mmax+1) complex64."""
    C = jnp.asarray(C)
    Cl = jnp.moveaxis(C, 1, 0)  # (lmax+1, B, M)
    tb = tables.get('np', tables)  # host tables; dev flavour may be unmaterialised
    ore, oim = _synth_pallas(tables['S'],
                             jnp.asarray(tb['alpha'], jnp.float32),
                             jnp.asarray(tb['beta'], jnp.float32),
                             jnp.asarray(tb['gamma'], jnp.float32),
                             jnp.asarray(tb['l0']),
                             jnp.asarray(tb['seed_v'], jnp.float32),
                             jnp.asarray(tb['seed_k']),
                             jnp.asarray(x, jnp.float32),
                             jnp.real(Cl).astype(jnp.float32),
                             jnp.imag(Cl).astype(jnp.float32), interpret)
    return ore + 1j * oim


def _anal_kernel(S, LC, R_T, alpha_ref, beta_ref, gamma_ref, l0_ref,
                 seedv_ref, seedk_ref, x_ref, qre_ref, qim_ref,
                 are_ref, aim_ref, dm1_ref, d_ref, k_ref):
    """Analysis: A_{lm} = sum_j Q_{jm} d^l_{m,n}(theta_j).

    Grid (m-tiles, l-chunks, ring-tiles): ring tiles innermost so each output l-block is
    revisited consecutively (Pallas accumulation rule); the recursion state for ALL rings
    of the current m-tile lives in (Rp, M_T) scratch, sliced per ring tile."""
    lchunk = pl.program_id(1)
    rtile = pl.program_id(2)
    rows = pl.ds(rtile * R_T, R_T)

    @pl.when(lchunk == 0)
    def _():
        l0 = l0_ref[0, :]
        init = (l0 == 0)[None, :]
        d_ref[rows, :] = jnp.where(init, seedv_ref[:, :], 0.)
        k_ref[rows, :] = jnp.where(init, seedk_ref[:, :], 0)
        dm1_ref[rows, :] = jnp.zeros((R_T, l0.shape[0]), dm1_ref.dtype)

    @pl.when(rtile == 0)
    def _():
        are_ref[:, :, :] = jnp.zeros_like(are_ref)
        aim_ref[:, :, :] = jnp.zeros_like(aim_ref)

    x = x_ref[:, 0][:, None]
    l0 = l0_ref[0, :][None, :]
    seedv = seedv_ref[:, :]
    seedk = seedk_ref[:, :]
    thresh = 2.0 ** (S // 2)
    down = 2.0 ** (-S)
    qre = qre_ref[:, :, :]            # (B, R_T, M_T)
    qim = qim_ref[:, :, :]

    def body(j, state):
        dm1, d, k = state
        deff = d * jnp.exp2((S * k).astype(d.dtype))
        are_ref[j, :, :] += jnp.sum(qre * deff[None, :, :], axis=1)
        aim_ref[j, :, :] += jnp.sum(qim * deff[None, :, :], axis=1)
        al = alpha_ref[j, :][None, :]
        bl = beta_ref[j, :][None, :]
        gl = gamma_ref[j, :][None, :]
        l = lchunk * LC + j
        d_next = (al * x + bl) * d - gl * dm1
        inject = (l + 1) == l0
        d_new = jnp.where(inject, 0., d)
        d_next = jnp.where(inject, seedv, d_next)
        k = jnp.where(inject, seedk, k)
        cond = (k < 0) & (jnp.abs(d_next) > thresh)
        fac = jnp.where(cond, down, 1.)
        return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)

    dm1, d, k = jax.lax.fori_loop(0, LC, body,
                                  (dm1_ref[rows, :], d_ref[rows, :], k_ref[rows, :]))
    dm1_ref[rows, :] = dm1
    d_ref[rows, :] = d
    k_ref[rows, :] = k


@partial(jax.jit, static_argnums=(0, 1, 11))
def _anal_pallas(S, lmaxp1, alpha, beta, gamma, l0, seed_v, seed_k, x, Q_re, Q_im,
                 interpret=False):
    """(lmax+1, B, M) real/imag A from (B, R, M) pre-weighted ring arrays (all f32)."""
    B, R, M = Q_re.shape
    M_T = 128
    R_T = 128
    LC = 128
    mt = -(-M // M_T)
    rt = -(-R // R_T)
    lt = -(-lmaxp1 // LC)
    Mp, Rp, Lp = mt * M_T, rt * R_T, lt * LC

    def padto(a, shape):
        pads = [(0, s - d) for d, s in zip(a.shape, shape)]
        return jnp.pad(a, pads)

    alpha = padto(alpha, (Lp, Mp))
    beta = padto(beta, (Lp, Mp))
    gamma = padto(gamma, (Lp, Mp))
    l0p = padto(l0.astype(jnp.int32)[None, :], (1, Mp)) + jnp.where(
        jnp.arange(Mp) >= M, jnp.int32(2 * Lp + 10), 0)[None, :]
    seed_v = padto(seed_v, (Rp, Mp))
    seed_k = padto(seed_k, (Rp, Mp))
    xp = padto(x[:, None], (Rp, 1))
    Q_re = padto(Q_re, (B, Rp, Mp))
    Q_im = padto(Q_im, (B, Rp, Mp))

    grid = (mt, lt, rt)
    kernel = partial(_anal_kernel, S, LC, R_T)
    out_shape = [jax.ShapeDtypeStruct((Lp, B, Mp), jnp.float32),
                 jax.ShapeDtypeStruct((Lp, B, Mp), jnp.float32)]
    in_specs = [
        pl.BlockSpec((LC, M_T), lambda m, l, r: (l, m)),           # alpha
        pl.BlockSpec((LC, M_T), lambda m, l, r: (l, m)),           # beta
        pl.BlockSpec((LC, M_T), lambda m, l, r: (l, m)),           # gamma
        pl.BlockSpec((1, M_T), lambda m, l, r: (0, m)),            # l0
        pl.BlockSpec((R_T, M_T), lambda m, l, r: (r, m)),          # seed_v
        pl.BlockSpec((R_T, M_T), lambda m, l, r: (r, m)),          # seed_k
        pl.BlockSpec((R_T, 1), lambda m, l, r: (r, 0)),            # x
        pl.BlockSpec((B, R_T, M_T), lambda m, l, r: (0, r, m)),    # Q_re
        pl.BlockSpec((B, R_T, M_T), lambda m, l, r: (0, r, m)),    # Q_im
    ]
    out_specs = [pl.BlockSpec((LC, B, M_T), lambda m, l, r: (l, 0, m)),
                 pl.BlockSpec((LC, B, M_T), lambda m, l, r: (l, 0, m))]
    are, aim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Rp, M_T), jnp.float32),
                        pltpu.VMEM((Rp, M_T), jnp.float32),
                        pltpu.VMEM((Rp, M_T), jnp.int32)],
        interpret=interpret,
    )(alpha, beta, gamma, l0p, seed_v, seed_k, xp, Q_re, Q_im)
    return are[:lmaxp1, :, :M], aim[:lmaxp1, :, :M]


def legendre_anal_pallas(Q, tables, x, lmax, interpret=False):
    """Drop-in analysis using the Pallas kernel; Q (batch, nrings, mmax+1) complex,
    pre-weighted by the quadrature weights (as core.legendre_anal expects).
    Returns (batch, lmax+1, mmax+1) complex64."""
    Q = jnp.asarray(Q)
    tb = tables.get('np', tables)  # host tables; dev flavour may be unmaterialised
    are, aim = _anal_pallas(tables['S'], lmax + 1,
                            jnp.asarray(tb['alpha'], jnp.float32),
                            jnp.asarray(tb['beta'], jnp.float32),
                            jnp.asarray(tb['gamma'], jnp.float32),
                            jnp.asarray(tb['l0']),
                            jnp.asarray(tb['seed_v'], jnp.float32),
                            jnp.asarray(tb['seed_k']),
                            jnp.asarray(x, jnp.float32),
                            jnp.real(Q).astype(jnp.float32),
                            jnp.imag(Q).astype(jnp.float32), interpret)
    A = are + 1j * aim
    return jnp.moveaxis(A, 0, 1)  # (B, lmax+1, M)


# ===================================================================== fused NS pair
# Production TPU path: the (-n, +n) recursions fused on the northern half of a
# symmetric grid, complex parts folded into the batch axis. See module docstring.

def _pair_tiles():
    """(B_T, R_T_synth, LC_synth, R_T_anal, LC_anal) tile sizes; env-overridable.

    Larger synthesis ring tiles cut the coefficient re-reads (traffic ~ C x nrings/R_T);
    larger analysis l-chunks cut the Fourier-mode re-reads (traffic ~ Q x (lmax+1)/LC).
    Defaults sized so the VMEM working set stays well inside the raised Mosaic scoped
    limit (PLK_PALLAS_VMEM_MB, default 96 MB of the v5e's 128 MB VMEM) — bigger tiles
    trade VMEM for fewer HBM revisits."""
    import os
    e = os.environ
    return (int(e.get('PLK_PALLAS_BT', 8)), int(e.get('PLK_PALLAS_RT', 512)),
            int(e.get('PLK_PALLAS_LC_SYNTH', 128)), int(e.get('PLK_PALLAS_RT_ANAL', 128)),
            int(e.get('PLK_PALLAS_LC', 512)),
            int(e.get('PLK_PALLAS_VMEM_MB', 96)))


def _fit(n, T, mult=8):
    """Shrink tile T to the smallest `mult`-aligned tile with the same tile count
    over n — keeps the HBM-revisit count of T while minimising padded work (e.g.
    nh = 1025 with T = 512 pads to 1536 (+50% flops); the fitted 344 pads to 1032)."""
    nt = -(-n // T)
    fit = -(-(-(-n // nt)) // mult) * mult
    return min(T, fit)


def _synth_dims(lmaxp1, B, M, nh, tiles):
    """Fitted (B_T, R_T, LC, bt, mt, rt, lt, Bp, Mp, Rp, Lp) for the synthesis grid."""
    M_T = 128
    B_T, R_T, LC = _fit(B, tiles[0]), _fit(nh, tiles[1]), _fit(lmaxp1, tiles[2])
    bt, mt, rt, lt = (-(-B // B_T), -(-M // M_T), -(-nh // R_T), -(-lmaxp1 // LC))
    return B_T, R_T, LC, bt, mt, rt, lt, bt * B_T, mt * M_T, rt * R_T, lt * LC


def _anal_dims(lmaxp1, B, M, nh, tiles):
    """Fitted dims for the analysis grid (R_T/LC from the analysis tile slots)."""
    M_T = 128
    B_T, R_T, LC = _fit(B, tiles[0]), _fit(nh, tiles[3]), _fit(lmaxp1, tiles[4])
    bt, mt, rt, lt = (-(-B // B_T), -(-M // M_T), -(-nh // R_T), -(-lmaxp1 // LC))
    return B_T, R_T, LC, bt, mt, rt, lt, bt * B_T, mt * M_T, rt * R_T, lt * LC


def _padto(a, shape):
    return jnp.pad(a, [(0, s - d) for d, s in zip(a.shape, shape)])


def _pad_l0(l0, M, Mp, Lp):
    """Pad the first-degree row so padded m columns never seed."""
    return _padto(l0.astype(jnp.int32)[None, :], (1, Mp)) + jnp.where(
        jnp.arange(Mp) >= M, jnp.int32(2 * Lp + 10), 0)[None, :]


def _kernel_rec(l_abs, st, al, bl, gl, x, l0, sv, sk, thresh, down):
    """One scaled Wigner-d step inside a kernel (mirror of core._rec_step)."""
    dm1, d, k = st
    d_next = (al * x + bl) * d - gl * dm1
    inject = (l_abs + 1) == l0
    d_new = jnp.where(inject, 0., d)
    d_next = jnp.where(inject, sv, d_next)
    k = jnp.where(inject, sk, k)
    cond = (k < 0) & (jnp.abs(d_next) > thresh)
    fac = jnp.where(cond, down, 1.)
    return d_new * fac, d_next * fac, k + cond.astype(jnp.int32)


def _init_state(l0, sv, sk):
    init = (l0 == 0)
    return (jnp.zeros_like(sv), jnp.where(init, sv, 0.),
            jnp.where(init, sk, 0))


def _make_synth_pair_kernel(S, LC, single):
    thresh = 2.0 ** (S // 2)
    down = 2.0 ** (-S)

    def kernel(*refs):
        if single:
            (am, bm, gm, l0m_r, svm, skm, x_r, cp,
             opn, ops, dm1m, dm_r, km_r) = refs
        else:
            (am, bm, gm, ap, bp, gp, l0m_r, l0p_r, svm, skm, svp, skp, x_r, cp, cm,
             opn, ops, omn, oms, dm1m, dm_r, km_r, dm1p, dp_r, kp_r) = refs
        lchunk = pl.program_id(3)
        l0m = l0m_r[0, :][None, :]
        svm_v, skm_v = svm[:, :], skm[:, :]
        x = x_r[:, 0][:, None]

        @pl.when(lchunk == 0)
        def _():
            d0 = _init_state(l0m, svm_v, skm_v)
            dm1m[:, :], dm_r[:, :], km_r[:, :] = d0
            opn[:, :, :] = jnp.zeros_like(opn)
            ops[:, :, :] = jnp.zeros_like(ops)
            if not single:
                p0 = _init_state(l0p_r[0, :][None, :], svp[:, :], skp[:, :])
                dm1p[:, :], dp_r[:, :], kp_r[:, :] = p0
                omn[:, :, :] = jnp.zeros_like(omn)
                oms[:, :, :] = jnp.zeros_like(oms)

        if not single:
            l0p = l0p_r[0, :][None, :]
            svp_v, skp_v = svp[:, :], skp[:, :]

        def body(j, st):
            st_m = st[:3]
            dm_eff = st_m[1] * jnp.exp2((S * st_m[2]).astype(st_m[1].dtype))
            if single:
                dp_eff = dm_eff
            else:
                st_p = st[3:]
                dp_eff = st_p[1] * jnp.exp2((S * st_p[2]).astype(st_p[1].dtype))
            l_abs = lchunk * LC + j
            sgn_l = (1. - 2. * (l_abs % 2)).astype(dm_eff.dtype)
            cpj = cp[j, :, :]                      # (B_T, M_T)
            opn[:, :, :] += cpj[:, None, :] * dm_eff[None]
            ops[:, :, :] += cpj[:, None, :] * (sgn_l * dp_eff)[None]
            if not single:
                cmj = cm[j, :, :]
                omn[:, :, :] += cmj[:, None, :] * dp_eff[None]
                oms[:, :, :] += cmj[:, None, :] * (sgn_l * dm_eff)[None]
            st_m = _kernel_rec(l_abs, st_m, am[j, :][None, :], bm[j, :][None, :],
                               gm[j, :][None, :], x, l0m, svm_v, skm_v, thresh, down)
            if single:
                return st_m
            st_p = _kernel_rec(l_abs, st_p, ap[j, :][None, :], bp[j, :][None, :],
                               gp[j, :][None, :], x, l0p, svp_v, skp_v, thresh, down)
            return st_m + st_p

        st0 = (dm1m[:, :], dm_r[:, :], km_r[:, :])
        if not single:
            st0 = st0 + (dm1p[:, :], dp_r[:, :], kp_r[:, :])
        st = jax.lax.fori_loop(0, LC, body, st0)
        dm1m[:, :], dm_r[:, :], km_r[:, :] = st[:3]
        if not single:
            dm1p[:, :], dp_r[:, :], kp_r[:, :] = st[3:]

    return kernel


def synth_pair_cost(lmaxp1, B, M, nh, single, tiles=None):
    """(flops, bytes_accessed) of the fused synthesis kernel: the honest HBM-traffic
    statement attached as pl.CostEstimate and consumed by bench.py."""
    _, _, _, bt, mt, rt, lt, Bp, Mp, Rp, Lp = _synth_dims(
        lmaxp1, B, M, nh, tiles or _pair_tiles())
    ntab, nseed, ncoef, nout, nrec = (3, 2, 1, 2, 1) if single else (6, 4, 2, 4, 2)
    byt = (ntab * Lp * Mp * 4 * bt * rt           # recursion tables, per (b, ring-tile)
           + nseed * Rp * Mp * 4 * bt             # seeds, once per (b, m, r)
           + ncoef * Lp * Bp * Mp * 4 * rt        # coefficients, per ring tile
           + nout * Bp * Rp * Mp * 4)             # outputs, once
    fl = (nrec * 12 * Lp * Rp * Mp * bt           # d-recursion
          + nout * 3 * Lp * Rp * Mp * Bp)         # accumulates
    return int(fl), int(byt)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _synth_pair_pallas(S, single, tiles, interpret, am, bm, gm, ap, bp, gp,
                       l0m, l0p, svm, skm, svp, skp, x, Cp2, Cm2):
    """Fused NS synthesis on northern-half tables. Cp2/Cm2 (lmax+1, 2B, M) f32 (complex
    folded into batch); returns (opn, ops[, omn, oms]) (2B, nh, M) f32 stacks."""
    lmaxp1, B, M = Cp2.shape
    nh = x.shape[0]
    M_T = 128
    B_T, R_T, LC, bt, mt, rt, lt, Bp, Mp, Rp, Lp = _synth_dims(lmaxp1, B, M, nh, tiles)

    tabs_m = [_padto(t, (Lp, Mp)) for t in (am, bm, gm)]
    l0m_p = _pad_l0(l0m, M, Mp, Lp)
    seeds_m = [_padto(svm, (Rp, Mp)), _padto(skm, (Rp, Mp))]
    xp = _padto(x[:, None], (Rp, 1))
    Cp_p = _padto(Cp2, (Lp, Bp, Mp))

    t_spec = pl.BlockSpec((LC, M_T), lambda b, m, r, l: (l, m))
    l0_spec = pl.BlockSpec((1, M_T), lambda b, m, r, l: (0, m))
    sd_spec = pl.BlockSpec((R_T, M_T), lambda b, m, r, l: (r, m))
    x_spec = pl.BlockSpec((R_T, 1), lambda b, m, r, l: (r, 0))
    c_spec = pl.BlockSpec((LC, B_T, M_T), lambda b, m, r, l: (l, b, m))
    o_spec = pl.BlockSpec((B_T, R_T, M_T), lambda b, m, r, l: (b, r, m))

    if single:
        ins = tabs_m + [l0m_p] + seeds_m + [xp, Cp_p]
        in_specs = [t_spec] * 3 + [l0_spec] + [sd_spec] * 2 + [x_spec, c_spec]
        nout = 2
    else:
        tabs_p = [_padto(t, (Lp, Mp)) for t in (ap, bp, gp)]
        seeds_p = [_padto(svp, (Rp, Mp)), _padto(skp, (Rp, Mp))]
        Cm_p = _padto(Cm2, (Lp, Bp, Mp))
        ins = (tabs_m + tabs_p + [l0m_p, _pad_l0(l0p, M, Mp, Lp)]
               + seeds_m + seeds_p + [xp, Cp_p, Cm_p])
        in_specs = ([t_spec] * 6 + [l0_spec] * 2 + [sd_spec] * 4
                    + [x_spec, c_spec, c_spec])
        nout = 4
    scratch = [pltpu.VMEM((R_T, M_T), jnp.float32), pltpu.VMEM((R_T, M_T), jnp.float32),
               pltpu.VMEM((R_T, M_T), jnp.int32)] * (1 if single else 2)
    fl, byt = synth_pair_cost(lmaxp1, B, M, nh, single, tiles)
    outs = pl.pallas_call(
        _make_synth_pair_kernel(S, LC, single),
        grid=(bt, mt, rt, lt),
        in_specs=in_specs,
        out_specs=[o_spec] * nout,
        out_shape=[jax.ShapeDtypeStruct((Bp, Rp, Mp), jnp.float32)] * nout,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(flops=fl, bytes_accessed=byt, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tiles[5] * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return tuple(o[:B, :nh, :M] for o in outs)


def _make_anal_pair_kernel(S, LC, R_T, single):
    thresh = 2.0 ** (S // 2)
    down = 2.0 ** (-S)

    def kernel(*refs):
        if single:
            (am, bm, gm, l0m_r, svm, skm, x_r, qpn, qps,
             A, dm1m, dm_r, km_r) = refs
        else:
            (am, bm, gm, ap, bp, gp, l0m_r, l0p_r, svm, skm, svp, skp, x_r,
             qpn, qps, qmn, qms, A, Bc,
             dm1m, dm_r, km_r, dm1p, dp_r, kp_r) = refs
        lchunk = pl.program_id(2)
        rtile = pl.program_id(3)
        rows = pl.ds(rtile * R_T, R_T)
        l0m = l0m_r[0, :][None, :]
        svm_v, skm_v = svm[:, :], skm[:, :]
        x = x_r[:, 0][:, None]

        @pl.when(lchunk == 0)
        def _():
            d0 = _init_state(l0m, svm_v, skm_v)
            dm1m[rows, :], dm_r[rows, :], km_r[rows, :] = d0
            if not single:
                p0 = _init_state(l0p_r[0, :][None, :], svp[:, :], skp[:, :])
                dm1p[rows, :], dp_r[rows, :], kp_r[rows, :] = p0

        @pl.when(rtile == 0)
        def _():
            A[:, :, :] = jnp.zeros_like(A)
            if not single:
                Bc[:, :, :] = jnp.zeros_like(Bc)

        if not single:
            l0p = l0p_r[0, :][None, :]
            svp_v, skp_v = svp[:, :], skp[:, :]
        qn = qpn[:, :, :]             # (B_T, R_T, M_T)
        qs = qps[:, :, :]
        if not single:
            qnm = qmn[:, :, :]
            qsm = qms[:, :, :]

        def body(j, st):
            st_m = st[:3]
            dm_eff = st_m[1] * jnp.exp2((S * st_m[2]).astype(st_m[1].dtype))
            if single:
                dp_eff = dm_eff
            else:
                st_p = st[3:]
                dp_eff = st_p[1] * jnp.exp2((S * st_p[2]).astype(st_p[1].dtype))
            l_abs = lchunk * LC + j
            sgn_l = (1. - 2. * (l_abs % 2)).astype(dm_eff.dtype)
            A[j, :, :] += (jnp.sum(qn * dm_eff[None], axis=1)
                           + sgn_l * jnp.sum(qs * dp_eff[None], axis=1))
            if not single:
                Bc[j, :, :] += (jnp.sum(qnm * dp_eff[None], axis=1)
                                + sgn_l * jnp.sum(qsm * dm_eff[None], axis=1))
            st_m = _kernel_rec(l_abs, st_m, am[j, :][None, :], bm[j, :][None, :],
                               gm[j, :][None, :], x, l0m, svm_v, skm_v, thresh, down)
            if single:
                return st_m
            st_p = _kernel_rec(l_abs, st_p, ap[j, :][None, :], bp[j, :][None, :],
                               gp[j, :][None, :], x, l0p, svp_v, skp_v, thresh, down)
            return st_m + st_p

        st0 = (dm1m[rows, :], dm_r[rows, :], km_r[rows, :])
        if not single:
            st0 = st0 + (dm1p[rows, :], dp_r[rows, :], kp_r[rows, :])
        st = jax.lax.fori_loop(0, LC, body, st0)
        dm1m[rows, :], dm_r[rows, :], km_r[rows, :] = st[:3]
        if not single:
            dm1p[rows, :], dp_r[rows, :], kp_r[rows, :] = st[3:]

    return kernel


def anal_pair_cost(lmaxp1, B, M, nh, single, tiles=None):
    """(flops, bytes_accessed) of the fused analysis kernel (see synth_pair_cost)."""
    _, _, _, bt, mt, rt, lt, Bp, Mp, Rp, Lp = _anal_dims(
        lmaxp1, B, M, nh, tiles or _pair_tiles())
    ntab, nseed, nq, nout, nrec = (3, 2, 2, 1, 1) if single else (6, 4, 4, 2, 2)
    byt = (ntab * Lp * Mp * 4 * bt                # tables, once per (b, m, l)
           + nseed * Rp * Mp * 4 * bt * lt        # seeds, per l-chunk
           + nq * Bp * Rp * Mp * 4 * lt           # Fourier modes, per l-chunk
           + nout * Lp * Bp * Mp * 4)             # outputs, once
    fl = (nrec * 12 * Lp * Rp * Mp * bt
          + nq * 3 * Lp * Rp * Mp * Bp)
    return int(fl), int(byt)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _anal_pair_pallas(S, lmaxp1, single, tiles, interpret, am, bm, gm, ap, bp, gp,
                      l0m, l0p, svm, skm, svp, skp, x, Qpn, Qps, Qmn, Qms):
    """Fused NS analysis on northern-half data. Q* (2B, nh, M) f32 (complex folded,
    south rows mirrored + sgn_m-signed by the caller); returns (A[, Bc])
    (lmax+1, 2B, M) f32."""
    B, nh, M = Qpn.shape
    M_T = 128
    B_T, R_T, LC, bt, mt, rt, lt, Bp, Mp, Rp, Lp = _anal_dims(lmaxp1, B, M, nh, tiles)

    tabs_m = [_padto(t, (Lp, Mp)) for t in (am, bm, gm)]
    l0m_p = _pad_l0(l0m, M, Mp, Lp)
    seeds_m = [_padto(svm, (Rp, Mp)), _padto(skm, (Rp, Mp))]
    xp = _padto(x[:, None], (Rp, 1))
    qs_p = [_padto(q, (Bp, Rp, Mp)) for q in
            ((Qpn, Qps) if single else (Qpn, Qps, Qmn, Qms))]

    t_spec = pl.BlockSpec((LC, M_T), lambda b, m, l, r: (l, m))
    l0_spec = pl.BlockSpec((1, M_T), lambda b, m, l, r: (0, m))
    sd_spec = pl.BlockSpec((R_T, M_T), lambda b, m, l, r: (r, m))
    x_spec = pl.BlockSpec((R_T, 1), lambda b, m, l, r: (r, 0))
    q_spec = pl.BlockSpec((B_T, R_T, M_T), lambda b, m, l, r: (b, r, m))
    o_spec = pl.BlockSpec((LC, B_T, M_T), lambda b, m, l, r: (l, b, m))

    if single:
        ins = tabs_m + [l0m_p] + seeds_m + [xp] + qs_p
        in_specs = [t_spec] * 3 + [l0_spec] + [sd_spec] * 2 + [x_spec] + [q_spec] * 2
        nout = 1
    else:
        tabs_p = [_padto(t, (Lp, Mp)) for t in (ap, bp, gp)]
        seeds_p = [_padto(svp, (Rp, Mp)), _padto(skp, (Rp, Mp))]
        ins = (tabs_m + tabs_p + [l0m_p, _pad_l0(l0p, M, Mp, Lp)]
               + seeds_m + seeds_p + [xp] + qs_p)
        in_specs = ([t_spec] * 6 + [l0_spec] * 2 + [sd_spec] * 4
                    + [x_spec] + [q_spec] * 4)
        nout = 2
    scratch = [pltpu.VMEM((Rp, M_T), jnp.float32), pltpu.VMEM((Rp, M_T), jnp.float32),
               pltpu.VMEM((Rp, M_T), jnp.int32)] * (1 if single else 2)
    fl, byt = anal_pair_cost(lmaxp1, B, M, nh, single, tiles)
    outs = pl.pallas_call(
        _make_anal_pair_kernel(S, LC, R_T, single),
        grid=(bt, mt, lt, rt),
        in_specs=in_specs,
        out_specs=[o_spec] * nout,
        out_shape=[jax.ShapeDtypeStruct((Lp, Bp, Mp), jnp.float32)] * nout,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(flops=fl, bytes_accessed=byt, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tiles[5] * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    return tuple(o[:lmaxp1, :B, :M] for o in outs)


# ------------------------------------------------------------------ public pair API
def _fold_cplx(a):
    """(B, ...) complex -> (2B, ...) f32 (re block then im block)."""
    return jnp.concatenate([jnp.real(a), jnp.imag(a)], axis=0).astype(jnp.float32)


def _unfold_cplx(a, B):
    return a[:B] + 1j * a[B:]


def _tb32(t):
    """f32 jnp views of a recursion-table set."""
    tb = t['np']
    return {k: jnp.asarray(v, jnp.float32) if v.dtype.kind == 'f' else jnp.asarray(v)
            for k, v in tb.items()}


def legendre_synth_pair_pallas(Cp, Cm, spin, theta, t_m, t_p, interpret=False):
    """Fused NS-pair synthesis; same contract as core.legendre_synth_pair restricted to
    symmetric grids. t_m/t_p: f32 recursion tables on the NORTHERN half (t_p is t_m for
    spin 0). Cm may be None. Returns (Fp, Fm) complex64 (B, nrings, M)."""
    Cp = jnp.asarray(Cp)
    nrings = len(np.asarray(theta))
    nh = (nrings + 1) // 2
    n_s = nrings - nh
    B = Cp.shape[0]
    M = Cp.shape[-1]
    single = Cm is None and spin == 0
    tiles = _pair_tiles()
    m_m = _tb32(t_m)
    Cp2 = jnp.moveaxis(_fold_cplx(Cp), 1, 0)         # (lmax+1, 2B, M)
    sgn_m = jnp.where(jnp.arange(M) % 2 == 0, 1., -1.).astype(jnp.float32)
    if single:
        opn, ops = _synth_pair_pallas(
            t_m['S'], True, tiles, interpret,
            m_m['alpha'], m_m['beta'], m_m['gamma'], None, None, None,
            m_m['l0'], None, m_m['seed_v'], m_m['seed_k'], None, None,
            m_m['x'], Cp2, None)
        omn = oms = None
    else:
        m_p = _tb32(t_p)
        # Cm may itself be None for a single non-zero-spin transform (plain synth of
        # the (-spin) component only): feed zeros, discard Fm.
        Cm2 = (jnp.zeros_like(Cp2) if Cm is None
               else jnp.moveaxis(_fold_cplx(jnp.asarray(Cm)), 1, 0))
        opn, ops, omn, oms = _synth_pair_pallas(
            t_m['S'], False, tiles, interpret,
            m_m['alpha'], m_m['beta'], m_m['gamma'],
            m_p['alpha'], m_p['beta'], m_p['gamma'],
            m_m['l0'], m_p['l0'], m_m['seed_v'], m_m['seed_k'],
            m_p['seed_v'], m_p['seed_k'], m_m['x'], Cp2, Cm2)

    def assemble(o_n, o_s):
        F = _unfold_cplx(o_n, B)
        Fs = _unfold_cplx(o_s, B) * sgn_m[None, None, :]
        return jnp.concatenate([F, Fs[:, :n_s][:, ::-1]], axis=1)

    Fp = assemble(opn, ops)
    Fm = None if Cm is None else assemble(omn, oms)
    return Fp, Fm


def legendre_anal_pair_pallas(Qp, Qm, spin, theta, lmax, t_m, t_p, interpret=False):
    """Fused NS-pair analysis; same contract as core.legendre_anal_pair restricted to
    symmetric grids. Qp/Qm (B, nrings, M) complex, pre-weighted; Qm may be None.
    Returns (A, Bc) complex64 (B, lmax+1, M)."""
    Qp = jnp.asarray(Qp)
    nrings = Qp.shape[1]
    nh = (nrings + 1) // 2
    n_s = nrings - nh
    B = Qp.shape[0]
    M = Qp.shape[-1]
    single = Qm is None and spin == 0
    tiles = _pair_tiles()
    m_m = _tb32(t_m)
    sgn_m = jnp.where(jnp.arange(M) % 2 == 0, 1., -1.).astype(jnp.float32)

    def fold(Q):
        Qn = Q[:, :nh]
        Qs = Q[:, nrings - 1:nh - 1:-1]
        if n_s < nh:
            Qs = jnp.pad(Qs, ((0, 0), (0, nh - n_s), (0, 0)))
        return _fold_cplx(Qn), _fold_cplx(Qs * sgn_m[None, None, :])

    Qpn, Qps = fold(Qp)
    if single:
        (A2,) = _anal_pair_pallas(
            t_m['S'], lmax + 1, True, tiles, interpret,
            m_m['alpha'], m_m['beta'], m_m['gamma'], None, None, None,
            m_m['l0'], None, m_m['seed_v'], m_m['seed_k'], None, None,
            m_m['x'], Qpn, Qps, None, None)
        return _unfold_cplx(jnp.moveaxis(A2, 1, 0), B), None  # (B, lmax+1, M)
    m_p = _tb32(t_p)
    Qmn, Qms = (jnp.zeros_like(Qpn), jnp.zeros_like(Qps)) if Qm is None \
        else fold(jnp.asarray(Qm))
    A2, B2 = _anal_pair_pallas(
        t_m['S'], lmax + 1, False, tiles, interpret,
        m_m['alpha'], m_m['beta'], m_m['gamma'],
        m_p['alpha'], m_p['beta'], m_p['gamma'],
        m_m['l0'], m_p['l0'], m_m['seed_v'], m_m['seed_k'],
        m_p['seed_v'], m_p['seed_k'], m_m['x'], Qpn, Qps, Qmn, Qms)
    out = []
    for o in (A2, B2):
        oc = _unfold_cplx(jnp.moveaxis(o, 1, 0), B)   # (B, lmax+1, M)
        out.append(oc)
    return out[0], (None if Qm is None else out[1])
